"""bench.py end-to-end smoke on CPU with a tiny config.

The driver runs ``python bench.py`` unattended at the end of every round;
a rotted code path there (an unguarded variable, a gate crash) would cost
the round's headline artifact.  This drives main() through every section
that runs off-TPU — engine timing, oracle gates, the full-batch
comparator-style gate, and the JSON-line contract."""

import json
import sys
from pathlib import Path

import pytest


def test_bench_main_cpu_smoke(tiny_cfg, capsys, monkeypatch):
    import vit_tpu.config as config_mod

    import bench

    monkeypatch.setitem(config_mod.CONFIGS, "vit_tiny_test", tiny_cfg)
    bench.main(["--model", "vit_tiny_test", "--batch", "4"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["value"] > 0 and out["unit"] == "images/sec/chip"
    assert out["backend"] == "cpu" and out["ops_impl"] == "xla"
    # the oracle gates ran and passed (tie-robust on synthetic weights)
    assert out["bf16_label_match_vs_oracle"] is True
    assert out["bf16_full_batch_comparator_pass"] is True
    assert out["fp32_max_logit_dev_vs_oracle"] < 1e-3
    assert out["timing_samples"] >= 3


@pytest.mark.parametrize(
    "script",
    ["bench_kernels", "bench_train", "bench_train_longseq", "bench_variants"],
)
def test_bench_scripts_help_never_touches_device(script, monkeypatch):
    """--help must print usage without running the device preflight: the
    preflight can legitimately block for VIT_TPU_PREFLIGHT_S (900 s) on a
    wedged tunnel — exactly when a user reaches for --help.  Args parse
    first; SystemExit(0) fires before the (poisoned) probe can."""
    scripts = Path(__file__).resolve().parent.parent / "scripts"

    def boom(*a, **k):
        raise AssertionError("device_preflight ran before argparse")

    from vit_tpu.runtime import profiler

    monkeypatch.setattr(profiler, "device_preflight", boom)
    monkeypatch.setattr(sys, "argv", [f"{script}.py", "--help"])
    sys.path.insert(0, str(scripts))
    try:
        mod = __import__(script)
        with pytest.raises(SystemExit) as ei:
            mod.main()
        assert ei.value.code == 0
    finally:
        sys.path.remove(str(scripts))
        sys.modules.pop(script, None)
