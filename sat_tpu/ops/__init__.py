from sat_tpu.ops.lstm import lstm_cell, init_lstm_params

__all__ = ["lstm_cell", "init_lstm_params"]
