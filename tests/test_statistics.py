"""Model statistics (params/FLOPs) tests."""
import pytest

from tpu_speech_commands.evaluation import clever_format, get_model_statistics


def test_clever_format():
    assert clever_format(1_500_000) == "1.500M"
    assert clever_format(2_000) == "2.000K"
    assert clever_format(3e9) == "3.000G"
    assert clever_format(12) == "12.000B"


@pytest.mark.parametrize("model_type,min_params,max_params", [
    ("simple_cnn", 100_000, 200_000),
    ("simple_cnn_lite", 30_000, 80_000),
    ("simple_gru", 9_000, 20_000),
    ("simple_lstm", 12_000, 25_000),
])
def test_statistics(model_type, min_params, max_params):
    stats = get_model_statistics(model_type, num_classes=5, batch_size=1)
    assert min_params < stats["params"] < max_params, stats["params"]
    assert stats["flops"] > 0
    assert stats["params_str"].endswith(("K", "M"))
