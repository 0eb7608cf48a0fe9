"""Probe-library design (offline workload; reference library_tools/)."""

from .seqint import (seq2int, seq2int_rc, seq_to_kmer_ints,
                     count_kmers_dense, native_available)
from .design import (KmerCountTable, read_fasta, reverse_complement,
                     gc_content, melting_temperature, design_probes,
                     assemble_probes, check_probes, ProbeReport)

__all__ = [
    "seq2int", "seq2int_rc", "seq_to_kmer_ints", "count_kmers_dense",
    "native_available",
    "KmerCountTable", "read_fasta", "reverse_complement", "gc_content",
    "melting_temperature", "design_probes", "assemble_probes",
    "check_probes", "ProbeReport",
]
