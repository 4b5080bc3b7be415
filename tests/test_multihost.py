"""Multi-host (pod) integration: a REAL 2-process jax.distributed CPU
cluster (4 virtual devices each, gloo collectives) trains through the
full engine path with per-process input sharding and process-0
checkpointing, and must reproduce the single-process 8-device run's
losses — the global batch composition is identical by construction
(deterministic shuffle stream; parallel/multihost.py).

This is the fake-backend capability SURVEY §5.8 requires for pod-scale
DP without pod hardware (replaces reference net.py:1147-1163 at scale).
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # see pytest.ini: core profile is -m "not slow"

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope='module')
def mh_dataset(tmp_path_factory):
    from ursonet_tpu.data.synthetic import make_urso_dataset
    d = tmp_path_factory.mktemp('mh') / 'soyuz_mh'
    make_urso_dataset(str(d), subsets=('train', 'val'), n_per_subset=16,
                      width=96, height=72)
    return str(d)


def test_local_batch_slice_math():
    """Slice math on the in-process 8-device (single-process) mesh."""
    from ursonet_tpu import parallel
    from ursonet_tpu.parallel import multihost

    mesh = parallel.make_mesh(data=8, model=1)
    lo, hi = multihost.local_batch_slice(mesh, 16)
    assert (lo, hi) == (0, 16)  # single process backs all rows

    mesh = parallel.make_mesh(data=4, model=2)
    lo, hi = multihost.local_batch_slice(mesh, 8)
    assert (lo, hi) == (0, 8)


def test_generator_batch_slice_matches_full(mh_dataset):
    """batch_slice=(lo,hi) yields exactly rows lo:hi of the full
    deterministic global batch stream."""
    from ursonet_tpu.data import loader as L
    from ursonet_tpu.data.urso import Urso

    from multihost_common import make_tiny_config
    cfg = make_tiny_config(mesh_data=8)
    ds = Urso()
    ds.load_dataset(mh_dataset, cfg, 'train')

    full = L.data_generator(ds, cfg, batch_size=8, seed=5, raw=True)
    lo_gen = L.data_generator(ds, cfg, batch_size=8, seed=5, raw=True,
                              batch_slice=(0, 4))
    hi_gen = L.data_generator(ds, cfg, batch_size=8, seed=5, raw=True,
                              batch_slice=(4, 8))
    for _ in range(3):  # spans a shuffle boundary (16 images / batch 8)
        f = next(full)
        a, b = next(lo_gen), next(hi_gen)
        for k in f:
            np.testing.assert_array_equal(f[k][:4], a[k])
            np.testing.assert_array_equal(f[k][4:], b[k])


@pytest.mark.parametrize('nprocs,dpp', [(2, 4), (4, 2)])
def test_cluster_matches_single_process(mh_dataset, tmp_path, nprocs, dpp):
    """A real nprocs-process cluster run (dpp virtual devices each, 8
    global) reproduces the single-process 8-device losses, and exactly
    one process writes checkpoints. The 4×2 shape exercises the
    narrower per-process input slices (VERDICT r2 #8)."""
    from multihost_common import make_tiny_config, run_one_epoch

    # Reference: single process, same 8-way data mesh, same seeds.
    cfg = make_tiny_config(mesh_data=8)
    ref = run_one_epoch(cfg, mh_dataset, str(tmp_path / 'logs_ref'))

    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env['PYTHONPATH'] = TESTS_DIR + os.pathsep + \
        os.path.dirname(TESTS_DIR) + os.pathsep + env.get('PYTHONPATH', '')
    workdir = str(tmp_path)

    def spawn(port):
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(TESTS_DIR, 'multihost_worker.py'),
             str(pid), str(nprocs), str(port), mh_dataset, workdir,
             str(dpp)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for pid in range(nprocs)]
        return procs, [p.communicate(timeout=900)[0].decode()
                       for p in procs]

    # Gloo's TCP pair setup can time out on a loaded 1-core CI box (the
    # coordinator comes up but a worker's connect stalls past gloo's
    # internal deadline). That is infrastructure flake, not a numerics
    # failure — retry the whole cluster once on a fresh port before
    # declaring failure.
    port = 12801 + ((os.getpid() + 7 * nprocs) % 500)
    procs, outs = spawn(port)
    if any(p.returncode != 0 for p in procs) and any(
            'Connect timeout' in o or 'Gloo context initialization' in o
            for o in outs):
        procs, outs = spawn(port + 531)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out[-4000:]}'

    with open(os.path.join(workdir, 'metrics_mh.json')) as f:
        mh = json.load(f)

    # Same global batches + same init seed -> same losses (fp tolerance).
    for k in ('loss', 'val_loss', 'ori_loss'):
        assert k in mh and k in ref
        np.testing.assert_allclose(mh[k], ref[k], rtol=2e-4, atol=2e-5)

    # Process-0-writes policy: exactly one copy of each artifact.
    run_dirs = glob.glob(os.path.join(workdir, 'logs_mh', 'mhtiny*'))
    assert len(run_dirs) == 1
    assert len(glob.glob(os.path.join(run_dirs[0], 'weights_*'))) == 1
    assert os.path.exists(os.path.join(run_dirs[0],
                                       'state_latest.msgpack'))


def test_generator_batch_slice_index_array(mh_dataset):
    """An index-array batch_slice (interleaved slice topology) yields
    exactly those rows of the full deterministic global stream."""
    from ursonet_tpu.data import loader as L
    from ursonet_tpu.data.urso import Urso

    from multihost_common import make_tiny_config
    cfg = make_tiny_config(mesh_data=8)
    ds = Urso()
    ds.load_dataset(mh_dataset, cfg, 'train')

    rows = np.array([1, 2, 5, 6])  # non-contiguous
    full = L.data_generator(ds, cfg, batch_size=8, seed=5, raw=True)
    part = L.data_generator(ds, cfg, batch_size=8, seed=5, raw=True,
                            batch_slice=rows)
    for _ in range(3):
        f, p = next(full), next(part)
        for k in f:
            np.testing.assert_array_equal(f[k][rows], p[k])


def test_generator_multihost_error_is_loud(mh_dataset):
    """With a batch_slice set (multi-host), a decode failure raises
    immediately instead of the single-host 5-strike skip, which would
    silently desync the global shuffle stream across hosts."""
    from ursonet_tpu.data import loader as L
    from ursonet_tpu.data.urso import Urso

    from multihost_common import make_tiny_config
    cfg = make_tiny_config(mesh_data=8)
    cfg.NATIVE_LOADER = False
    ds = Urso()
    ds.load_dataset(mh_dataset, cfg, 'train')
    for info in ds.image_info:  # every decode now fails
        info['path'] = info['path'] + '.missing'

    gen = L.data_generator(ds, cfg, batch_size=8, seed=5, raw=True,
                           batch_slice=(0, 4))
    with pytest.raises(Exception):
        next(gen)
    # single-host generators still tolerate (up to 5) bad images
    gen_single = L.data_generator(ds, cfg, batch_size=8, seed=5, raw=True)
    with pytest.raises(Exception):
        next(gen_single)  # >5 failures in one batch still raises


def test_shard_batch_local_noncontiguous_assembly():
    """shard_batch_local places non-contiguously-owned rows at their
    global positions via per-device assembly (single-process mesh: all
    rows are local, so the permutation is fully checkable)."""
    from ursonet_tpu import parallel
    from ursonet_tpu.parallel import multihost

    mesh = parallel.make_mesh(data=8, model=1)
    rows = np.array([2, 3, 0, 1, 6, 7, 4, 5])  # local storage order
    global_batch = np.arange(8 * 5, dtype=np.float32).reshape(8, 5)
    local = {'x': global_batch[rows]}
    out = multihost.shard_batch_local(mesh, local, 8, batch_slice=rows)
    np.testing.assert_array_equal(np.asarray(out['x']), global_batch)


def test_slice_rows_forms():
    from ursonet_tpu.parallel.multihost import slice_rows
    np.testing.assert_array_equal(slice_rows(None, 4), [0, 1, 2, 3])
    np.testing.assert_array_equal(slice_rows((2, 5), 8), [2, 3, 4])
    np.testing.assert_array_equal(slice_rows(np.array([7, 1]), 8), [7, 1])
