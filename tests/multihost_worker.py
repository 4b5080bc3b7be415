"""Worker process for the multi-host integration test
(tests/test_multihost.py): one of N processes in a real
jax.distributed CPU cluster, each owning 4 virtual devices.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
       <dataset_dir> <workdir> [devices_per_process=4]

Trains the tiny config for one epoch through the full engine path —
per-process input sharding, gloo collectives, process-0 checkpointing —
and (on process 0) dumps the epoch metrics to <workdir>/metrics_mh.json.
"""

import json
import os
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    dataset_dir, workdir = sys.argv[4], sys.argv[5]
    dpp = int(sys.argv[6]) if len(sys.argv) > 6 else 4

    os.environ['XLA_FLAGS'] = \
        f'--xla_force_host_platform_device_count={dpp}'
    os.environ['URSONET_NO_COMPILATION_CACHE'] = '1'
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from ursonet_tpu.parallel import multihost
    assert multihost.initialize(f'127.0.0.1:{port}', nprocs, pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == dpp * nprocs

    from multihost_common import make_tiny_config, run_one_epoch
    cfg = make_tiny_config(mesh_data=dpp * nprocs)
    means = run_one_epoch(cfg, dataset_dir, os.path.join(workdir, 'logs_mh'))

    if jax.process_index() == 0:
        with open(os.path.join(workdir, 'metrics_mh.json'), 'w') as f:
            json.dump(means, f)
    print(f'worker {pid} done', flush=True)


if __name__ == '__main__':
    main()
