from .cnn import SimpleCNN, SimpleCNNLite
from .factory import (
    CNN_MODEL_TYPES,
    MODEL_TYPES,
    features_to_input,
    get_model,
    init_model,
    input_shape,
    is_cnn,
    score_fn,
)
from .rnn import SimpleGRU, SimpleLSTM

__all__ = [
    "SimpleCNN",
    "SimpleCNNLite",
    "SimpleGRU",
    "SimpleLSTM",
    "MODEL_TYPES",
    "CNN_MODEL_TYPES",
    "get_model",
    "init_model",
    "input_shape",
    "is_cnn",
    "features_to_input",
    "score_fn",
]
