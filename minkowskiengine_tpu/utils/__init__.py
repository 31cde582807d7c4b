"""Utility subpackage: quantization, collation, init, summaries."""

from .collation import SparseCollation, batch_sparse_collate, batched_coordinates, sparse_collate
from .coords import get_coords_map
from .gradcheck import gradcheck
from .init import kaiming_normal_, kaiming_uniform_
from .quantization import (
    fnv_hash_vec,
    quantize,
    quantize_label,
    ravel_hash_vec,
    sparse_quantize,
)
from .checkpoint import load_checkpoint, save_checkpoint
from .profiling import Timer, named_scope, timer, trace
from .summary import summary
from .torch_import import (
    export_reference_state_dict,
    load_reference_state_dict,
    reference_named_params,
)
