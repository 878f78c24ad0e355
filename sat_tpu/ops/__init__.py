from sat_tpu.ops.lstm import lstm_cell, init_lstm_params
from sat_tpu.ops.fused_attention import (
    fused_attention_block,
    fused_attention_trainable,
    fused_soft_attention,
)

__all__ = [
    "lstm_cell",
    "init_lstm_params",
    "fused_attention_block",
    "fused_attention_trainable",
    "fused_soft_attention",
]
