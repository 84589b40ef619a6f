"""pandaseq_tpu: a TPU-native paired-end Illumina read merger.

A from-scratch JAX/XLA/Pallas framework with the capabilities of PANDAseq
(reference: neufeld/pandaseq v2.11): probabilistic overlap alignment of
paired FASTQ reads, amplicon reconstruction with quality-aware mismatch
resolution, primer location/stripping, a validation-filter chain, and
FASTA/FASTQ emission with STAT logging — batched over read pairs and
data-parallel across TPU meshes.
"""

__version__ = "0.1.0"
VERSION_MAJOR = 0
VERSION_MINOR = 1
