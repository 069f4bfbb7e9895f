"""Config-corpus smoke test: every generated benchmark YAML must load,
resolve a canvas, and build its detector + optimizer (the CPU analog of the
reference's ``tests/test_all_configs_cityscapes.sh``, which needed a GPU,
checkpoints, and real data; full 1-iteration training is covered per family
in test_end_to_end/test_yolo/test_detr)."""

import glob
import os

import jax
import pytest

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL_CONFIGS = sorted(
    os.path.relpath(p, CONFIG_ROOT)
    for p in glob.glob(os.path.join(CONFIG_ROOT, "**", "*.yaml"),
                       recursive=True)
)


def test_corpus_is_complete():
    # 7 base + 1 vendored-d2 + 18 cityscapes + 5 sim10k + 5 cfc
    assert len(ALL_CONFIGS) >= 36, ALL_CONFIGS


@pytest.mark.parametrize("rel", ALL_CONFIGS)
def test_config_builds_detector_and_optimizer(rel):
    from aldi_tpu.config import get_cfg
    from aldi_tpu.models import build_detector
    from aldi_tpu.solver import build_lr_schedule

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(CONFIG_ROOT, rel))
    # shrink static shapes so construction stays cheap (no jit here)
    cfg.TPU.CANVAS = (64, 64)
    cfg.TPU.MAX_GT = 4
    cfg.freeze()
    det = build_detector(cfg)
    assert det.canvas == (64, 64)
    assert det.num_classes > 0
    sched = build_lr_schedule(cfg)
    lr0 = float(sched(0))
    lr_end = float(sched(cfg.SOLVER.MAX_ITER - 1))
    assert lr0 > 0 and lr_end >= 0
