"""The examples/ scripts must keep running end-to-end (they are the
library-API onboarding surface — examples/README.md)."""

import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _run(name, argv):
    sys.path.insert(0, str(EXAMPLES))
    try:
        mod = __import__(name)
        return mod.main(argv)
    finally:
        sys.path.remove(str(EXAMPLES))
        sys.modules.pop(name, None)


def test_classify_example(capsys):
    # vit_b_16 synthetic forward on CPU: a few seconds, real shapes
    assert _run("classify", ["--batch", "2"]) == 0
    out = capsys.readouterr().out
    assert "[0] label:" in out and "rollout" in out


def test_classify_example_quant_skips_fp_extras(tiny_cfg, capsys, monkeypatch):
    """--ops quant (a value the --ops help advertises) must classify and
    exit 0: the features/attention-rollout extras need fp weights and are
    skipped on the int8 engine instead of crashing after the predictions."""
    import vit_tpu.config as config_mod

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    assert _run(
        "classify", ["--batch", "2", "--config", "vit_tiny_test",
                     "--ops", "quant"]
    ) == 0
    out = capsys.readouterr().out
    assert "[0] label:" in out and "rollout" not in out


def test_finetune_example(capsys):
    assert _run("finetune", []) == 0  # exit 1 if top-1 < 0.9
    assert "train top-1" in capsys.readouterr().out


def test_serve_example(capsys):
    assert _run("serve_batching", ["--requests", "4"]) == 0
    out = capsys.readouterr().out
    assert "served 4 requests" in out and "p99" in out


def test_parallel_example(capsys):
    # conftest already provides the 8-device virtual CPU mesh
    assert _run("parallel", ["--devices", "8"]) == 0
    out = capsys.readouterr().out
    assert "dp=4 x tp=2" in out and "pp=2" in out and "OK" in out


def test_distill_example(capsys):
    assert _run("distill", ["--alpha", "1.0"]) == 0  # pure KD
    out = capsys.readouterr().out
    assert "dist-head agreement" in out


@pytest.mark.parametrize(
    "name", ["classify", "finetune", "serve_batching", "parallel", "distill"]
)
def test_examples_have_cpu_flag(name):
    # the scripts promise --cpu works everywhere; keep the flag wired
    text = (EXAMPLES / f"{name}.py").read_text()
    assert '"--cpu"' in text and "jax_platforms" in text
