"""CLI argument-contract tests (no model compiles — validation layer only).

Pins the ADVICE r3 fix: a plain ``--build_engine`` run must not demand
``--images`` (they were never read), while ``--int8`` still requires them
as the calibration set.
"""

import pytest

from maskrcnn_tf2_tpu.cli import detect


def test_detect_requires_images_by_default():
    with pytest.raises(SystemExit):
        detect.main(["--backbone", "resnet18"])


def test_detect_int8_build_engine_requires_images():
    with pytest.raises(SystemExit):
        detect.main(["--build_engine", "/tmp/x.engine", "--int8"])


def test_detect_plain_build_engine_passes_validation():
    """Validation must accept --build_engine without --images; prove the
    parse/validation layer passed by failing LATER on an unknown backbone
    (cheap — no graph is ever built)."""
    with pytest.raises(ValueError, match="unknown backbone"):
        detect.main(["--build_engine", "/tmp/x.engine", "--backbone", "nosuch"])
