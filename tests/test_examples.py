"""Smoke tests for the runnable examples (small configs, CPU)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    if extra_env:
        env.update(extra_env)
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)


def test_train_rotation_bank_example(tmp_path):
    import examples.train_rotation_bank as ex

    out = ex.main(str(tmp_path), angle_step=45.0, size=128)
    assert os.path.exists(os.path.join(out, "part.yaml.gz"))
    assert os.path.exists(os.path.join(out, "detector_linemod.yaml"))
    assert os.path.exists(os.path.join(out, "infos.yaml"))


def test_multichip_example_subprocess():
    # subprocess: the example must set up its own virtual devices
    r = _run(["examples/multichip_match.py", "4"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sharded == single-device" in r.stdout


def test_deployment_loop_example():
    import examples.deployment_loop as ex

    ex.main(n_frames=1, num_templates=24, hw=256)
