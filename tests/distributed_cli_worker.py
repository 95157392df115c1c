"""Worker for tests/test_distributed.py::test_two_process_cli_train.

Usage: python distributed_cli_worker.py <port> <process_id> <num_procs> <datadir>

Runs the SHIPPED string_kernel CLI as one rank of a 2-process
jax.distributed job: the CLI itself initializes distribution from the
environment (cli.app.run_app -> parallel.distributed.initialize), builds
the global 2x4-device mesh, shards the Gram pair axis across it, and
writes output from process 0 only — i.e. the binary is the multi-host
program, like the reference's MPI mains
(/root/reference/common/framework.h:418-433).
"""

import os
import sys


def main() -> int:
    port, pid, nproc, datadir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # the mpirun-analogue launch contract consumed by the CLI itself
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    # don't race the shared persistent compile cache from two processes
    jax.config.update("jax_enable_compilation_cache", False)

    from stem_kernel_tpu.cli import string_kernel

    out = os.path.join(datadir, f"km_rank{pid}.dat")
    rc = string_kernel.main([
        "-n", out,
        "+1", os.path.join(datadir, "pos.fa"),
        "-1", os.path.join(datadir, "neg.fa"),
    ])
    assert rc == 0
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc
    # rank-0-only I/O: the output file exists exactly on process 0's path
    assert os.path.exists(out) == (pid == 0), (out, pid)
    print(f"cli worker {pid}: ok", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
