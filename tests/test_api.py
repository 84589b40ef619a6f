"""Library API surface (api.Assembler), idset, url reader, prefetch."""

import numpy as np
import pytest

from tests.test_oracle_golden import F1, F2, _ensure_ref, ref_output


def test_assembler_stream_matches_reference():
    import pandaseq_tpu as pt
    from pandaseq_tpu.io import output as out_mod

    asm = pt.Assembler()
    chunks = [out_mod.format_fasta(res)
              for res in asm.stream(F1, F2)]
    assert b"".join(chunks) == ref_output([])


def test_assembler_single_pair():
    import pandaseq_tpu as pt

    asm = pt.Assembler()
    amp = ("ACGTACGTACGTTACGGACCTAGGACTTACGATCGGACTACGGTACCGTA"
           "GGATCCTAGCATCGATCGGATCCGATTACAGCATCGATCAGGATCCAGCT")
    fwd = amp[:70]
    rev = _revcomp(amp)[:70]
    res, code = asm.assemble("pair1", fwd, rev)
    assert code == "OK"
    assert res.sequence == amp
    assert res.overlap == 40


def _revcomp(s):
    return s.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def test_assembler_setters():
    import pandaseq_tpu as pt

    asm = pt.Assembler()
    asm.algorithm = "pear"
    assert asm.algorithm == "pear"
    asm.threshold = 0.8
    assert abs(asm.threshold - 0.8) < 1e-12
    asm.minimum_overlap = 10
    asm.maximum_overlap = 100
    asm.num_kmers = 3
    asm.set_forward_primer("ACGT")
    assert list(asm.cfg.forward_primer) == [1, 2, 4, 8]
    asm.set_reverse_primer("ACGT")  # stored complemented
    assert list(asm.cfg.reverse_primer) == [8, 4, 2, 1]
    asm.add_module("min_phred:5")
    assert asm.modules[0].name == "min_phred"


def test_idset():
    from pandaseq_tpu.idset import IdSet

    s = IdSet()
    hdr = "M00000:7:000000000-TEST1:1:1101:10000:2000 1:N:0:ACGTAC"
    assert s.add_str("@" + hdr)
    assert len(s) == 1
    from pandaseq_tpu import seqid
    _, sid, _ = seqid.parse(hdr, seqid.TAG_PRESENT)
    assert s.contains(sid)
    assert sid in s
    assert not s.add_str("garbage###")


def test_open_url_file(tmp_path):
    import gzip
    from pandaseq_tpu.io.url import open_url

    p = tmp_path / "x.fastq.gz"
    p.write_bytes(gzip.compress(b"@r\nACGT\n+\nIIII\n"))
    with open_url("file://" + str(p)) as fh:
        assert fh.read() == b"@r\nACGT\n+\nIIII\n"
    # plain path passthrough
    q = tmp_path / "y.fastq"
    q.write_bytes(b"@r\nACGT\n+\nIIII\n")
    assert open_url(str(q)).read() == b"@r\nACGT\n+\nIIII\n"


def test_open_url_http(tmp_path):
    """The real network path (curl_reader.c:86-143): a local
    http.server serving plain, gzip and bz2 payloads, each sniffed by
    magic bytes off the non-seekable response stream."""
    import bz2
    import gzip
    import http.server
    import threading

    from pandaseq_tpu.io.url import open_url

    body = open(F1, "rb").read()
    body2 = open(F2, "rb").read()
    (tmp_path / "p.fastq").write_bytes(body)
    (tmp_path / "g.fastq.gz").write_bytes(gzip.compress(body))
    (tmp_path / "b.fastq.bz2").write_bytes(bz2.compress(body2))

    class Quiet(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=str(tmp_path), **kw)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Quiet)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = "http://127.0.0.1:%d" % srv.server_address[1]
        for name, want in (("p.fastq", body), ("g.fastq.gz", body),
                           ("b.fastq.bz2", body2)):
            with open_url(base + "/" + name) as fh:
                assert fh.read() == want, name
        # and end-to-end: the FASTQ reader over the HTTP gz stream
        from pandaseq_tpu.io import fastq as fq
        n = 0
        reader = fq.PairedFastqReader(
            open_url(base + "/g.fastq.gz"),
            open_url(base + "/b.fastq.bz2"), policy="PRESENT")
        try:
            while n < 32:
                next(reader)
                n += 1
        except (StopIteration, fq.StreamError):
            pass
        assert n == 32
    finally:
        srv.shutdown()
        srv.server_close()


def test_prefetch_order_and_errors():
    from pandaseq_tpu.io.prefetch import prefetch

    assert list(prefetch(range(100), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise ValueError("x")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError):
        next(it)


def test_api_count_getters_and_fail_callback():
    """The panda_assembler_get_* counter surface + set_fail_alignment."""
    import pandaseq_tpu as pt
    from tests.test_oracle_golden import F1, F2

    asm = pt.Assembler()
    asm.algorithm = "flash"  # rejects most pairs -> NOALGN traffic
    failed = []
    asm.set_fail_alignment(lambda pair: failed.append(str(pair.sid)))
    n_ok = sum(1 for _ in asm.stream(F1, F2))
    assert asm.ok_count == n_ok
    assert asm.failed_alignment_count == len(failed) > 0
    assert asm.count == (asm.ok_count + asm.failed_alignment_count
                         + asm.low_quality_count + asm.bad_read_count
                         + asm.no_forward_primer_count
                         + asm.no_reverse_primer_count)
    assert asm.slow_count >= 0
    hist = asm.overlap_count
    assert sum(hist.values()) == asm.ok_count + asm.low_quality_count \
        or sum(hist.values()) == asm.ok_count
    assert asm.longest_overlap == (max(hist) if hist else 0)


def test_copy_configuration():
    """panda_assembler_copy_configuration (assembler_support.c:119-137)."""
    import math
    import pandaseq_tpu as pt

    src = pt.Assembler()
    src.algorithm = pt.make_algorithm("pear")
    src.threshold = 0.7
    src.minimum_overlap = 5
    src.maximum_overlap = 300
    src.primers_after = True
    src.set_forward_primer("ACGT")
    src.set_reverse_trim(3)
    dst = pt.Assembler()
    dst.copy_configuration(src)
    assert dst.algorithm is src.algorithm
    assert math.isclose(dst.threshold, 0.7)
    assert dst.minimum_overlap == 5
    assert dst.maximum_overlap == 300
    assert dst.primers_after is True
    assert (dst.cfg.forward_primer == src.cfg.forward_primer).all()
    assert dst.cfg.reverse_trim == 3
    # counters are NOT copied
    assert dst.count == 0


def test_kmer_iterate_variants():
    """panda_iterate_qual/_result and the k parameter (iter.c:137-190)."""
    import numpy as np
    from pandaseq_tpu import kmer_iter

    nt = np.array([1, 2, 4, 8, 1, 2, 4, 8, 1, 2, 4, 8], dtype=np.int8)
    full = list(kmer_iter.iterate(nt))
    assert full and full[0][1] == 8  # first emission at the 9th base
    k4 = list(kmer_iter.iterate(nt, k=4))
    assert k4[0][1] == 4  # k=4: first emission at the 5th base
    assert all(v < (1 << 8) for v, _ in k4)
    assert list(kmer_iter.iterate_qual(nt)) == full
    assert list(kmer_iter.iterate_result(nt)) == full
    rev = list(kmer_iter.iterate(nt, reverse=True))
    assert rev and rev[0][1] == len(nt) - 1 - 8
    # k < 1 falls back to KMER_LEN (iter.c:144-145)
    assert list(kmer_iter.iterate(nt, k=0)) == full
