import pytest

from cl_tpu.config import PRESETS, get_preset, parse_overrides


def test_all_presets_construct():
    for name in PRESETS:
        cfg = get_preset(name)
        assert cfg.classes_per_task  # splits valid


def test_overrides():
    cfg = parse_overrides(["preset=smoke", "train.lr=0.01",
                           "method.methods=ewc,lwf",
                           "data.image_size=64", "train.data_parallel=false"])
    assert cfg.train.lr == 0.01
    assert cfg.method.methods == ("ewc", "lwf")
    assert cfg.data.image_size == 64
    assert cfg.train.data_parallel is False


def test_unknown_field_raises():
    with pytest.raises(ValueError):
        parse_overrides(["train.nope=1"])
    with pytest.raises(ValueError):
        parse_overrides(["nope.lr=1"])


def test_hash_ignores_operational_fields():
    a = parse_overrides(["preset=smoke"])
    b = parse_overrides(["preset=smoke", "train.resume=true",
                         "train.checkpoint_dir=/tmp/x",
                         "train.fail_after_task=0"])
    c = parse_overrides(["preset=smoke", "train.lr=0.5"])
    assert a.config_hash() == b.config_hash() != c.config_hash()
