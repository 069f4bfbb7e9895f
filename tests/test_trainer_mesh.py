"""Full trainer flow on a live 2-D (data x model) mesh: real loader ->
sharded train step -> orbax checkpoint of sharded arrays -> resume ->
re-shard. This is the user-facing path TPU.MESH_DATA/TPU.MESH_MODEL drive;
test_tensor_parallel.py covers the step math, this covers the plumbing
around it (trainer asserts, checkpoint round-trip, eval under a mesh)."""

import os

import numpy as np

from tests.test_end_to_end import base_cfg


def test_trainer_tp_mesh_train_checkpoint_resume(tmp_path):
    tmp = str(tmp_path)
    cfg = base_cfg(tmp, "out_tp")
    cfg.DATASETS.BATCH_CONTENTS = ("labeled_strong",)
    cfg.DATASETS.BATCH_RATIOS = (1,)
    cfg.EMA.ENABLED = True
    cfg.TPU.MESH_DATA = 4  # data WIDTH: 4 data x 2 model = 8 devices
    cfg.TPU.MESH_MODEL = 2
    cfg.SOLVER.IMS_PER_BATCH = 4  # divides the data-axis size 4
    cfg.freeze()

    from aldi_tpu.engine.trainer import ALDITrainer

    trainer = ALDITrainer(cfg)
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    trainer.resume_or_load(resume=False)
    trainer.train()
    assert int(np.asarray(trainer.state.step)) == 3
    assert trainer.checkpointer.has_checkpoint()
    sm = trainer.storage.latest()
    assert np.isfinite(sm["total_loss"])
    # params stayed tensor-parallel through the donated-step round trips
    from flax.traverse_util import flatten_dict

    sharded = [k for k, v in flatten_dict(trainer.state.params).items()
               if "model" in str(v.sharding.spec)]
    assert sharded, "no parameter kept the model-axis sharding"

    # eval under the live mesh
    results = trainer.test()
    assert "bbox/AP50" in results["synth_val"]

    # resume: orbax restore + re-shard onto the mesh
    trainer2 = ALDITrainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert int(np.asarray(trainer2.state.step)) == 3
    sharded2 = [k for k, v in flatten_dict(trainer2.state.params).items()
                if "model" in str(v.sharding.spec)]
    assert sharded2
    a = flatten_dict(trainer.state.params)
    b = flatten_dict(trainer2.state.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a[k], np.float32)
                            - np.asarray(b[k], np.float32))))
        for k in a)
    assert worst == 0.0, f"resumed params differ by {worst}"
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
