"""The interactive pause/step REPL (pause_play.rs:16-47, manual stepping
robot.rs:2448-2519): virtual time advances only on command, and exports and
reloads act on the live mid-run state."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_repl_step_run_export(tmp_path):
    out_json = tmp_path / "mid.json"
    script = (
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from magics_tpu.cli import main\n"
        "sys.exit(main(['-i', '/root/reference/config/scenarios/"
        "Communications Failure Experiment', '--interactive',"
        " '--max-time', '5', '--quiet']))\n"
    )
    cmds = f"step 3\nstatus\nrun 0.5\nexport {out_json}\nreset 7\nstatus\nquit\n"
    proc = subprocess.run(
        [sys.executable, "-c", script],
        input=cmds,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=400,
    )
    assert proc.returncode == 0, proc.stderr
    statuses = [
        json.loads(line)
        for line in proc.stderr.splitlines()
        if line.startswith("{")
    ]
    # step 3 then run 0.5s => 3 + 5 ticks
    assert statuses[0]["ticks"] == 3
    # after reset the clock rewound to 0 (the F5 flow)
    assert statuses[1]["ticks"] == 0
    assert out_json.exists()
    data = json.loads(out_json.read_text())
    assert data["makespan"] > 0


def test_repl_scenario_switch():
    """`load NAME` is the F4/F6 scenario-switch flow
    (simulation_loader.rs:594-720): the running world is dropped and the
    new scenario built from its own configs. No ticks are stepped, so the
    test only pays scenario-build time."""
    script = (
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from magics_tpu.cli import main\n"
        "sys.exit(main(['-i', 'Communications Failure Experiment',"
        " '--scenarios-dir', '/root/reference/config/scenarios',"
        " '--interactive', '--max-time', '5', '--quiet']))\n"
    )
    cmds = "status\nscenarios\nload Junction Experiment\nstatus\nquit\n"
    proc = subprocess.run(
        [sys.executable, "-c", script],
        input=cmds,
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    statuses = [
        json.loads(line)
        for line in proc.stderr.splitlines()
        if line.startswith("{")
    ]
    assert statuses[0]["robots"] == 21        # comms-failure circle
    assert statuses[1]["robots"] != 21        # junction formations
    # the CLI --max-time override carries across the switch — without it
    # the scenario's 10,000 s default materializes ~20k repeat-spawn specs
    assert statuses[1]["robots"] < 100
    assert statuses[1]["ticks"] == 0          # fresh world
    assert "Junction Experiment" in proc.stderr   # `scenarios` listing
    assert "loaded scenario: Junction Experiment" in proc.stderr
