from sat_tpu.compat.torch_decoder import decoder_params_from_state_dict

__all__ = ["decoder_params_from_state_dict"]
