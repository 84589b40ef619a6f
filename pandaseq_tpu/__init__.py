"""pandaseq_tpu: a TPU-native paired-end Illumina read merger.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PANDAseq
(reference: neufeld/pandaseq v2.11): probabilistic overlap alignment of
paired FASTQ reads, amplicon reconstruction with quality-aware mismatch
resolution, primer location/stripping, a validation-filter chain, and
FASTA/FASTQ emission with STAT logging — batched over read pairs and
data-parallel across TPU meshes.

Quick start::

    import pandaseq_tpu as pt
    asm = pt.Assembler()
    for result in asm.stream("forward.fastq", "reverse.fastq"):
        print(">%s;%f\\n%s" % (result.sid, result.quality,
                               result.sequence_ascii.tobytes().decode()))

CLIs: ``python -m pandaseq_tpu.cli.main`` (pandaseq), ``.cli.diffcmd``
(pandaseq-diff), ``.cli.hang`` (pandaseq-hang), ``.cli.checkid``
(pandaseq-checkid) — flag-compatible with the reference binaries.
"""

__version__ = "1.0.0"
VERSION_MAJOR = 1
VERSION_MINOR = 0
API = 3  # module API level mirrored from PANDA_API (pandaseq.h:61)


def __getattr__(name):
    # lazy exports so `import pandaseq_tpu` stays light (no jax import)
    if name == "Assembler":
        from .api import Assembler
        return Assembler
    if name == "OracleConfig":
        from .oracle import OracleConfig
        return OracleConfig
    if name == "make_algorithm":
        from .oracle import make_algorithm
        return make_algorithm
    if name == "IdSet":
        from .idset import IdSet
        return IdSet
    raise AttributeError(name)
