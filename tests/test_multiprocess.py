"""REAL multi-process execution: 2 jax.distributed processes (Gloo over
localhost, 2 virtual CPU devices each) train through the standard
Trainer/Evaluator on a global 4-device mesh, and must reproduce the
single-process run's loss/metric trajectory exactly — the deterministic
multi-host input contract (SURVEY §7 hard part 4; BASELINE multi-host
target).  This is the 2-host recipe: on real pods only the coordinator
address changes."""

import json
import socket

import pytest
import subprocess
import sys
from pathlib import Path

pytestmark = pytest.mark.slow  # heavy multi-device trajectory pins

WORKER = str(Path(__file__).with_name("mp_worker.py"))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    import os

    env = dict(os.environ)
    # the worker picks its own device count / platform
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"p{i}.json") for i in range(2)]
    ref_out = str(tmp_path / "single.json")
    env = _clean_env()

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), "2", outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    ref = subprocess.run(
        [sys.executable, WORKER, "0", "0", "1", ref_out],
        env=env, capture_output=True, timeout=300,
    )
    assert ref.returncode == 0, ref.stderr.decode()[-3000:]

    r0, r1, rs = (json.load(open(p)) for p in (*outs, ref_out))
    # both processes observed the identical global computation
    assert r0["records"] == r1["records"]
    assert r0["best"] == r1["best"]
    # and it equals the single-process trajectory bitwise (fp32 CPU,
    # same global batches, same reduction structure)
    for a, b in zip(r0["records"], rs["records"]):
        assert a["train_loss"] == b["train_loss"], (a, b)
        assert a["valid_score"] == b["valid_score"], (a, b)
    # save -> restart -> resume through the SHARED orbax checkpoint with
    # the row-sharded embedding: the resumed epochs replay the full
    # run's trajectory exactly, on both processes and single-process
    full = {r["epoch"]: r for r in r0["records"]}
    assert r0["resumed"] == r1["resumed"]
    assert r0["resumed"], "resumed run trained no epochs"
    for rec in r0["resumed"]:
        assert rec["train_loss"] == full[rec["epoch"]]["train_loss"], rec
    for rec_mp, rec_sp in zip(r0["resumed"], rs["resumed"]):
        assert rec_mp["train_loss"] == rec_sp["train_loss"], (rec_mp, rec_sp)
