from sat_tpu.engine.checkpoint import (
    tree_save_npz,
    tree_load_npz,
    save_decoder_checkpoint,
    load_decoder_checkpoint,
)
from sat_tpu.engine.evaluate import decode_caption, compute_bleu

__all__ = [
    "tree_save_npz",
    "tree_load_npz",
    "save_decoder_checkpoint",
    "load_decoder_checkpoint",
    "decode_caption",
    "compute_bleu",
]
