"""Smoke test for the config-5 multi-host recipe
(``benchmarks/config5_multihost.py``): DP-sharded training + sharded-
population SMC run end-to-end on the virtual 8-device mesh and stay on
their anchors at toy scale.
"""

import json
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_config5_script_end_to_end(capsys):
    from benchmarks.config5_multihost import main

    rc = main([
        "--size", "8", "--chains_per_device", "2", "--hidden", "16",
        "--train_steps", "4", "--chunk", "2",
        "--particles_per_device", "16", "--betas", "13",
        "--moves_per_rung", "3", "--leapfrog", "3",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    phases = {l["phase"]: l for l in lines}
    assert set(phases) == {"dp_training_weak_scaling", "smc_beta_ladder_sharded"}

    tr = phases["dp_training_weak_scaling"]
    assert tr["all_devices"]["devices"] == jax.device_count()
    assert tr["all_devices"]["train_steps_per_s"] > 0

    smc = phases["smc_beta_ladder_sharded"]
    # toy ladder still anchors: log Z within 10% of the factorized value,
    # plaquette within 0.05 of exact
    assert abs(smc["log_z"] - smc["log_z_exact_factorized"]) < 0.1 * abs(
        smc["log_z_exact_factorized"])
    assert abs(smc["plaq"] - smc["plaq_exact"]) < 0.05
