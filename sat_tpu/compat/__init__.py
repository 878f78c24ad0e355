from sat_tpu.compat.torch_decoder import (
    decoder_params_from_state_dict,
    state_dict_from_decoder_params,
)

__all__ = [
    "decoder_params_from_state_dict",
    "state_dict_from_decoder_params",
]
