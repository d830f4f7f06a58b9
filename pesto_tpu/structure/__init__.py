from .ops import (
    atom_select,
    clean_structure,
    concatenate_chains,
    data_to_structure,
    encode_bfactor,
    filter_non_atomic_subunits,
    preprocess_structure,
    remove_duplicate_tagged_subunits,
    res1to3,
    res3to1,
    split_by_chain,
    tag_hetatm_chains,
)

__all__ = [
    "atom_select",
    "clean_structure",
    "concatenate_chains",
    "data_to_structure",
    "encode_bfactor",
    "filter_non_atomic_subunits",
    "preprocess_structure",
    "remove_duplicate_tagged_subunits",
    "res1to3",
    "res3to1",
    "split_by_chain",
    "tag_hetatm_chains",
]
