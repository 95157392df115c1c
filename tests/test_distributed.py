"""Multi-process distribution: real jax.distributed over 2 CPU processes.

The reference's MPI path is genuinely multi-process
(/root/reference/common/kernel_matrix.cpp:199-261; MPIState
framework.h:418-433).  This test spawns 2 subprocesses, each with 4 virtual
CPU devices, wires them through jax.distributed, computes a sharded
pair-kernel over the global 8-device mesh, checks the values against a
single-process computation, and asserts process-0-only I/O.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_sharded_pair_kernel(tmp_path):
    port = _free_port()
    nproc = 2
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             str(port), str(pid), str(nproc), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}: ok" in out
    # process-0-only I/O: exactly one marker, from pid 0
    markers = sorted(f for f in os.listdir(tmp_path) if f.endswith(".marker"))
    assert markers == ["wrote_p0.marker"]
    # and the written Gram values match a local recomputation
    vals = np.load(tmp_path / "gram_vals.npy")
    n = 16
    feats = (np.arange(n * 3, dtype=np.float32) % 7).reshape(n, 3)
    iu = np.triu_indices(n)
    want = (feats[iu[0]] * feats[iu[1]]).sum(-1)
    np.testing.assert_allclose(vals, want, rtol=1e-6)


def test_two_process_cli_train(tmp_path):
    """The shipped string_kernel CLI as a 2-process jax.distributed program.

    The binary itself wires the distribution (run_app -> initialize ->
    resolve_mesh) and gates output on process 0 — the reference's binaries
    ARE the MPI programs (/root/reference/common/framework.h:418-433)."""
    seqs = ["gggcgcaagcuugaaagcgccc", "gggcgcaagucugaaagcgccc",
            "ggacgcaagcuugaaagcgucc", "cggcgcaaguuugaaagcgccg"]
    (tmp_path / "pos.fa").write_text(
        "".join(f">p{i}\n{s}\n" for i, s in enumerate(seqs[:2])))
    (tmp_path / "neg.fa").write_text(
        "".join(f">n{i}\n{s}\n" for i, s in enumerate(seqs[2:])))

    port = _free_port()
    nproc = 2
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_cli_worker.py"),
             str(port), str(pid), str(nproc), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"cli worker {pid} failed:\n{out}"
        assert f"cli worker {pid}: ok" in out

    # values equal to a single-process, single-device run of the same CLI
    from stem_kernel_tpu.cli import string_kernel
    from stem_kernel_tpu.gram.io import read_precomputed

    ref_out = str(tmp_path / "km_ref.dat")
    assert string_kernel.main(
        ["-n", ref_out, "--single-device",
         "+1", str(tmp_path / "pos.fa"), "-1", str(tmp_path / "neg.fa")]) == 0
    labels0, g0 = read_precomputed(str(tmp_path / "km_rank0.dat"))
    labels1, g1 = read_precomputed(ref_out)
    assert labels0 == labels1
    np.testing.assert_allclose(g0, g1, rtol=2e-5, atol=2e-6)
