from sat_tpu.models.attention import init_attention_params, soft_attention
from sat_tpu.models.decoder import (
    DecoderConfig,
    init_decoder_params,
    init_lstm_state,
    decode_step,
    decoder_forward,
)

__all__ = [
    "init_attention_params",
    "soft_attention",
    "DecoderConfig",
    "init_decoder_params",
    "init_lstm_state",
    "decode_step",
    "decoder_forward",
]
