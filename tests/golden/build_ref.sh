#!/bin/bash
# Build the unmodified C reference (read-only at /root/reference) into
# tests/ref_build/pandaseq-ref, used ONLY to generate golden outputs for
# bit-identical regression tests. The system lacks ltdl.h/bzlib.h dev
# headers, so minimal prototype stubs are provided here; no reference
# source is modified or copied into the framework.
set -euo pipefail

REF=/root/reference
OUT="$(dirname "$0")/../ref_build"
mkdir -p "$OUT"
cd "$OUT"

if [[ -x pandaseq-ref && pandaseq-ref -nt "$0" ]]; then
    echo "pandaseq-ref up to date"
    exit 0
fi

cat > config.h <<'EOF'
#ifndef CONFIG_H
#define CONFIG_H
#define HAVE_PTHREAD 1
#define MAX_LEN 450
#define PACKAGE_STRING "pandaseq 2.11"
#define PACKAGE_BUGREPORT "andre@masella.name"
#define PKGLIBDIR "/nonexistent/pandaseq"
#define VERSION_MAJOR 2
#define VERSION_MINOR 11
#define LIB_MAJOR 2
#define LIB_MINOR 11
#endif
EOF

# ltdl stub: module loading from disk is not exercised by golden runs
# (in-code modules via panda_module_new don't need it).
cat > ltdl.h <<'EOF'
#ifndef LTDL_STUB_H
#define LTDL_STUB_H
#define LT_PATHSEP_CHAR ':'
#define LT_DIRSEP_CHAR '/'
typedef void *lt_dlhandle;
typedef int (*lt_dlforeachfile_cb)(const char *filename, void *data);
typedef struct { char *filename; char *name; int ref_count; } lt_dlinfo;
const lt_dlinfo *lt_dlgetinfo(lt_dlhandle h);
int lt_dlinit(void);
int lt_dlexit(void);
int lt_dladdsearchdir(const char *dir);
const char *lt_dlgetsearchpath(void);
lt_dlhandle lt_dlopenext(const char *name);
void *lt_dlsym(lt_dlhandle h, const char *name);
int lt_dlclose(lt_dlhandle h);
const char *lt_dlerror(void);
int lt_dlforeachfile(const char *dirs, lt_dlforeachfile_cb cb, void *data);
#endif
EOF
# ltdl stub backed by a static registry of the baked-in plugins: the 11
# reference plugins are compiled directly into the golden binary (with
# their libtool-style <name>_LTX_* symbol prefixes) and lt_dlopenext
# resolves names against the registry, so `-C module:args` works exactly
# as with dynamic loading.
PLUGINS="after before completely_miss_the_point empty filter min_phred min_overlapbits other_primer overlap_stat pear_test sample validtag"

{
  echo '#include <stddef.h>'
  echo '#include <string.h>'
  echo '#include "ltdl.h"'
  for p in $PLUGINS; do
    echo "extern int ${p}_LTX_api;"
    echo "extern int ${p}_LTX_opener();"
  done
  echo 'struct stub_entry { const char *name; int *api; void *opener; };'
  echo 'static struct stub_entry stub_registry[] = {'
  for p in $PLUGINS; do
    echo "  { \"$p\", &${p}_LTX_api, (void *) &${p}_LTX_opener },"
  done
  echo '  { NULL, NULL, NULL } };'
  cat <<'EOF'
int lt_dlinit(void) { return 0; }
int lt_dlexit(void) { return 0; }
int lt_dladdsearchdir(const char *dir) { (void) dir; return 0; }
const char *lt_dlgetsearchpath(void) { return ""; }
lt_dlhandle lt_dlopenext(const char *name) {
    struct stub_entry *e;
    for (e = stub_registry; e->name != NULL; e++)
        if (strcmp(e->name, name) == 0)
            return (lt_dlhandle) e;
    return NULL;
}
void *lt_dlsym(lt_dlhandle h, const char *name) {
    struct stub_entry *e = (struct stub_entry *) h;
    if (e == NULL) return NULL;
    if (strcmp(name, "api") == 0) return (void *) e->api;
    if (strcmp(name, "opener") == 0) return e->opener;
    return NULL;
}
int lt_dlclose(lt_dlhandle h) { (void) h; return 0; }
const char *lt_dlerror(void) { return "module not baked into golden build"; }
int lt_dlforeachfile(const char *dirs, lt_dlforeachfile_cb cb, void *data) { (void) dirs; (void) cb; (void) data; return 0; }
const lt_dlinfo *lt_dlgetinfo(lt_dlhandle h) { (void) h; return NULL; }
EOF
} > ltdl_stub.c

# bzlib prototypes matching libbz2.so.1 ABI (header not installed).
cat > bzlib.h <<'EOF'
#ifndef BZLIB_STUB_H
#define BZLIB_STUB_H
#include <stdio.h>
#define BZ_OK 0
#define BZ_RUN 0
#define BZ_STREAM_END 4
typedef struct {
    char *next_in; unsigned int avail_in; unsigned int total_in_lo32; unsigned int total_in_hi32;
    char *next_out; unsigned int avail_out; unsigned int total_out_lo32; unsigned int total_out_hi32;
    void *state;
    void *(*bzalloc)(void *, int, int); void (*bzfree)(void *, void *); void *opaque;
} bz_stream;
typedef void BZFILE;
int BZ2_bzDecompressInit(bz_stream *strm, int verbosity, int small);
int BZ2_bzDecompress(bz_stream *strm);
int BZ2_bzDecompressEnd(bz_stream *strm);
BZFILE *BZ2_bzdopen(int fd, const char *mode);
BZFILE *BZ2_bzopen(const char *path, const char *mode);
int BZ2_bzread(BZFILE *b, void *buf, int len);
int BZ2_bzwrite(BZFILE *b, void *buf, int len);
void BZ2_bzclose(BZFILE *b);
BZFILE *BZ2_bzReadOpen(int *bzerror, FILE *f, int verbosity, int small, void *unused, int nUnused);
void BZ2_bzReadClose(int *bzerror, BZFILE *b);
int BZ2_bzRead(int *bzerror, BZFILE *b, void *buf, int len);
BZFILE *BZ2_bzWriteOpen(int *bzerror, FILE *f, int blockSize100k, int verbosity, int workFactor);
void BZ2_bzWrite(int *bzerror, BZFILE *b, void *buf, int len);
void BZ2_bzWriteClose(int *bzerror, BZFILE *b, int abandon, unsigned int *nbytes_in, unsigned int *nbytes_out);
#endif
EOF

CFLAGS="-O2 -std=gnu99 -I. -I$REF -DHAVE_CONFIG_H -include config.h -Wno-deprecated-declarations"

# Step 1: build and run the table generator (build-host program).
gcc $CFLAGS -o mktable "$REF/mktable.c" "$REF/tablebuilder.c" -lm
./mktable   # writes table.c / table.h into this directory

# Step 2: compile the library + pandaseq main.
SRCS="algo.c algo_ea_util.c algo_flash.c algo_pear.c algo_rdp_mle.c \
  algo_simple_bayes.c algo_stitch.c algo_uparse.c args.c args_array.c \
  args_assembler.c args_fastq.c args_hang.c assembler.c assembler_support.c \
  async.c buffer.c diff.c fastq.c fileio.c hang.c idset.c iter.c linebuf.c \
  misc.c module.c mux.c nt.c offset.c output.c proxy.c pool.c seqid.c writer.c"
OBJS=""
for s in $SRCS; do
    gcc $CFLAGS -c "$REF/$s" -o "${s%.c}.o"
    OBJS="$OBJS ${s%.c}.o"
done
gcc $CFLAGS -c table.c -o table.o
gcc $CFLAGS -c ltdl_stub.c -o ltdl_stub.o

# Baked-in plugins: each plugin .c + its per-plugin api symbol
# (panda_api.c), compiled with the libtool-style symbol prefix.
for p in $PLUGINS; do
    gcc $CFLAGS -DPANDASEQ_MODULE=$p -c "$REF/plugin_$p.c" -o "plugin_$p.o"
    gcc $CFLAGS -DPANDASEQ_MODULE=$p -c "$REF/panda_api.c" -o "api_$p.o"
    OBJS="$OBJS plugin_$p.o api_$p.o"
done

LIBS="-lz -lm -lpthread /usr/lib/x86_64-linux-gnu/libbz2.so.1"
gcc $CFLAGS -o pandaseq-ref "$REF/main.c" $OBJS table.o ltdl_stub.o $LIBS
gcc $CFLAGS -o pandaseq-diff-ref "$REF/main-diff.c" $OBJS table.o ltdl_stub.o $LIBS
gcc $CFLAGS -o pandaseq-hang-ref "$REF/main-hang.c" $OBJS table.o ltdl_stub.o $LIBS
gcc $CFLAGS -o pandaseq-checkid-ref "$REF/main-parse.c" $OBJS table.o ltdl_stub.o $LIBS
gcc $CFLAGS -o check_parser-ref "$REF/check_parser.c" $OBJS table.o ltdl_stub.o $LIBS

echo "built: $(ls pandaseq-ref pandaseq-diff-ref pandaseq-hang-ref pandaseq-checkid-ref)"
