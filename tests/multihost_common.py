"""Shared tiny-config/run helpers for the multi-host integration test —
imported both by the pytest process (single-process reference run) and by
the spawned cluster workers (tests/multihost_worker.py), so the two runs
are the same code path by construction."""

from ursonet_tpu.config import Config


def make_tiny_config(mesh_data: int) -> Config:
    cfg = Config()
    cfg.NAME = 'mhtiny'
    cfg.BACKBONE = 'resnet18'
    cfg.BOTTLENECK_WIDTH = 8
    cfg.BRANCH_SIZE = 16
    cfg.IMAGE_RESIZE_MODE = 'square'
    cfg.IMAGE_MAX_DIM = cfg.IMAGE_MIN_DIM = 64
    cfg.IMAGES_PER_GPU = 1
    cfg.MESH_DATA, cfg.MESH_MODEL = mesh_data, 1
    cfg.STEPS_PER_EPOCH = 3
    cfg.VALIDATION_STEPS = 1
    cfg.REGRESS_ORI = True
    cfg.ORIENTATION_PARAM = 'quaternion'
    cfg.ROT_AUG = cfg.ROT_IMAGE_AUG = cfg.SIM2REAL_AUG = False
    cfg.NATIVE_LOADER = False
    cfg.DATA_ON_DEVICE = False  # force the streaming input path
    cfg.SEED = 11
    cfg.update()
    return cfg


def run_one_epoch(cfg, dataset_dir: str, logs_dir: str) -> dict:
    from ursonet_tpu.data.urso import Urso
    from ursonet_tpu.engine import UrsoNet

    train_ds = Urso()
    train_ds.load_dataset(dataset_dir, cfg, 'train')
    val_ds = Urso()
    val_ds.load_dataset(dataset_dir, cfg, 'val')

    engine = UrsoNet('training', cfg, logs_dir)
    engine.initialize(seed=3)
    return engine.train(train_ds, val_ds, cfg.LEARNING_RATE, epochs=1,
                        layers='all', log_fn=lambda *a: None)
