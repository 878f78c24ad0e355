from sat_tpu.data.vocab import generate_json_data, process_caption_tokens
from sat_tpu.data.transforms import load_and_preprocess_image, preprocess_pil
from sat_tpu.data.dataset import CaptionDataset, BatchLoader

__all__ = [
    "generate_json_data",
    "process_caption_tokens",
    "load_and_preprocess_image",
    "preprocess_pil",
    "CaptionDataset",
    "BatchLoader",
]
