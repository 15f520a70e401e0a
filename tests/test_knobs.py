"""Knob registry: resolution order, validation, CLI surface, and the
vendored VMAF model (no runtime dependency on /root/reference)."""

import argparse
import os

import pytest

from pgtformer_tpu import knobs

pytestmark = pytest.mark.quick


@pytest.fixture(autouse=True)
def _clean():
    knobs.reset()
    yield
    knobs.reset()


def test_defaults():
    assert knobs.get("FUSED_TAIL") == "0"
    assert knobs.get("FUSE_TPATH") == "conv"
    assert knobs.get("EXACT_VQ") == "0"
    assert knobs.get("SW_KERNEL") == "5d"
    assert knobs.get("SUBPIXEL") == "dilated"
    assert knobs.get("SW_RPS") == ""


def test_env_fallback_and_override_priority(monkeypatch):
    monkeypatch.setenv("PGT_FUSE_TPATH", "einsum")
    assert knobs.get("FUSE_TPATH") == "einsum"
    knobs.set_knob("FUSE_TPATH", "conv")  # programmatic wins over env
    assert knobs.get("FUSE_TPATH") == "conv"
    knobs.reset("FUSE_TPATH")
    assert knobs.get("FUSE_TPATH") == "einsum"


def test_validation():
    with pytest.raises(ValueError):
        knobs.set_knob("EXACT_VQ", "2")
    with pytest.raises(ValueError, match="choices"):
        knobs.set_knob("SW_KERNEL", "6d")


def test_invalid_env_raises(monkeypatch):
    monkeypatch.setenv("PGT_SUBPIXEL", "bogus")
    with pytest.raises(ValueError):
        knobs.get("SUBPIXEL")


def test_cli_flags_roundtrip():
    parser = argparse.ArgumentParser()
    knobs.add_cli_flags(parser)
    args = parser.parse_args(["--exact-vq", "1", "--sw-rps", "4"])
    knobs.apply_cli_args(args)
    assert knobs.get("EXACT_VQ") == "1"
    assert knobs.get("SW_RPS") == "4"
    assert knobs.get("SW_KERNEL") == "5d"  # untouched


def test_cli_help_mentions_every_knob():
    parser = argparse.ArgumentParser()
    knobs.add_cli_flags(parser)
    txt = parser.format_help()
    for name in knobs.KNOBS:
        assert "--" + name.lower().replace("_", "-") in txt


def test_vendored_vmaf_model_is_package_relative():
    from pgtformer_tpu.eval import vmaf
    assert os.path.exists(vmaf._VENDORED_MODEL)
    assert "/root/reference" not in vmaf._VENDORED_MODEL
    assert vmaf._VENDORED_MODEL.startswith(
        os.path.dirname(os.path.abspath(vmaf.__file__)))
    # and it parses into a usable SVR model
    m = vmaf.VmafModel(vmaf._VENDORED_MODEL)
    assert m.feature_names and m.svs.shape[0] > 0


def test_main_cli_exposes_knob_flags():
    from pgtformer_tpu import cli
    with pytest.raises(SystemExit) as e:
        cli.main(["--help"])
    assert e.value.code == 0
