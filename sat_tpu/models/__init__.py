from sat_tpu.models.attention import (
    init_attention_params,
    precompute_attention_keys,
    soft_attention,
)
from sat_tpu.models.decoder import (
    DecoderConfig,
    init_decoder_params,
    init_lstm_state,
    decode_step,
    decoder_forward,
    embed_tokens,
)
from sat_tpu.models.beam import (
    BeamResult,
    beam_search,
    beam_search_batched,
    beam_search_vmapped,
    greedy_caption,
    sample_caption,
    extract_caption,
)
from sat_tpu.models.encoder import (
    encoder_forward,
    init_encoder_params,
)

__all__ = [
    "init_attention_params",
    "precompute_attention_keys",
    "soft_attention",
    "DecoderConfig",
    "init_decoder_params",
    "init_lstm_state",
    "decode_step",
    "decoder_forward",
    "embed_tokens",
    "BeamResult",
    "beam_search",
    "beam_search_batched",
    "beam_search_vmapped",
    "greedy_caption",
    "sample_caption",
    "extract_caption",
    "encoder_forward",
    "init_encoder_params",
]
