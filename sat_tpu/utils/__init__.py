from sat_tpu.utils.meters import AverageMeter
from sat_tpu.utils.metrics import (
    sequence_accuracy,
    calculate_caption_lengths,
    attention_regularization,
    masked_mean_cross_entropy,
)
from sat_tpu.utils.tables import count_parameters

__all__ = [
    "AverageMeter",
    "sequence_accuracy",
    "calculate_caption_lengths",
    "attention_regularization",
    "masked_mean_cross_entropy",
    "count_parameters",
]
