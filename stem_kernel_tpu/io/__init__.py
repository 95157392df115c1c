"""Sequence I/O: IUPAC alphabet, FASTA/CLUSTAL/MAF parsers, profile tensors."""

from .alphabet import (
    N_RNA,
    N_IUPAC,
    RNA_A,
    RNA_C,
    RNA_G,
    RNA_U,
    RNA_GAP,
    GAP_CHAR,
    IUPAC_WEIGHT,
    encode,
    decode,
    erase_gap,
)
from .parsers import (
    FileType,
    sniff_filetype,
    parse_fasta,
    parse_clustal,
    parse_maf,
    load_examples,
    iter_alignments,
    expand_globs,
)
from .profile import profile_from_alignment, index_map, Alignment

__all__ = [
    "N_RNA",
    "N_IUPAC",
    "RNA_A",
    "RNA_C",
    "RNA_G",
    "RNA_U",
    "RNA_GAP",
    "GAP_CHAR",
    "IUPAC_WEIGHT",
    "encode",
    "decode",
    "erase_gap",
    "FileType",
    "sniff_filetype",
    "parse_fasta",
    "parse_clustal",
    "parse_maf",
    "load_examples",
    "iter_alignments",
    "expand_globs",
    "profile_from_alignment",
    "index_map",
    "Alignment",
]
