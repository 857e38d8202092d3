"""docs/API.md stays in sync with the config surface: every dataclass
field must appear in its section's table (catches silently-undocumented
flags when config.py grows)."""

import dataclasses
import os

from cl_tpu import config as config_lib

API_MD = os.path.join(os.path.dirname(__file__), "..", "..", "docs",
                      "API.md")


def test_every_config_field_documented():
    with open(API_MD) as f:
        text = f.read()
    missing = []
    for cls in (config_lib.DataConfig, config_lib.ModelConfig,
                config_lib.MethodConfig, config_lib.TrainConfig):
        for fld in dataclasses.fields(cls):
            if f"`{fld.name}`" not in text:
                missing.append(f"{cls.__name__}.{fld.name}")
    assert not missing, f"undocumented config fields: {missing}"


def test_every_preset_documented():
    with open(API_MD) as f:
        text = f.read()
    assert "baseline_1" in text and "baseline_5" in text and "smoke" in text
