"""bench.py end-to-end smoke on CPU with a tiny config.

The driver runs ``python bench.py`` unattended at the end of every round;
a rotted code path there (an unguarded variable, a gate crash) would cost
the round's headline artifact.  This drives main() through every section
that runs off-TPU — engine timing, oracle gates, the full-batch
comparator-style gate, and the JSON-line contract."""

import json

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
