from .dataset import (
    Dataset,
    batch_iterator,
    extract_features_batched,
    get_dataset,
    get_sample_list,
    load_audio_batch,
)
from .wav import audio_to_buffer, buffer_to_audio, load_wav, save_audio

__all__ = [
    "Dataset",
    "batch_iterator",
    "extract_features_batched",
    "get_dataset",
    "get_sample_list",
    "load_audio_batch",
    "audio_to_buffer",
    "buffer_to_audio",
    "load_wav",
    "save_audio",
]
