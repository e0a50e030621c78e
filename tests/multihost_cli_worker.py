"""Worker process for the 2-process CLI train smoke (not a pytest module).

Each process: 2 virtual CPU devices + gloo collectives, then drives the REAL
product entry point ``istnet_tpu.cli.train.main()`` on a shared synthetic
NOCS tree with a ``parallel: {dp: 2, fsdp: 2}`` config. The multi-host wiring
under test is exactly what a pod run uses: ``multihost.initialize()`` from
the JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID env vars,
per-host division of the config's GLOBAL batch sizes, per-host data feeding
through ``multihost.global_batch``, and a sharded Orbax checkpoint written
cooperatively by both processes.

Usage: python tests/multihost_cli_worker.py <pid> <nproc> <port> <workdir>
(<workdir> must contain data/ from build_train_trees and config.yaml)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main() -> None:
    pid, nproc, port, workdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 int(sys.argv[3]), sys.argv[4])

    # the product path: cli.train calls multihost.initialize() with no args,
    # which resolves the coordinator from these env vars
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    from istnet_tpu.cli import train as cli_train

    sys.argv = ["train", "--config", os.path.join(workdir, "config.yaml"),
                "--data_dir", os.path.join(workdir, "data"),
                "--log_dir", os.path.join(workdir, "log")]
    cli_train.main()

    assert jax.process_count() == nproc, "initialize() did not take"
    print(f"MHCLI devices={jax.device_count()}", flush=True)

    ckpts = os.listdir(os.path.join(workdir, "log", "ckpt"))
    print(f"MHCLI ckpts={sorted(ckpts)}", flush=True)

    # rendezvous before exit (see multihost_worker.py: the atexit shutdown
    # barrier is shorter than possible post-run skew on a one-core host)
    from istnet_tpu.parallel import multihost
    multihost.barrier("istnet_mhcli_done")
    print("MHCLI ok", flush=True)


if __name__ == "__main__":
    main()
