"""End-to-end pipeline tests: video restore loop, trainer loop + resume."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.test_train import SMALL_VQ, SMALL_PGT, SMALL_DISC, FAST_HP, _batch


@pytest.fixture(scope="module")
def small_video(tmp_path_factory):
    import cv2
    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(10):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()
    return path


def test_video_restorer_end_to_end(small_video, tmp_path):
    from pgtformer_tpu.pipeline import VideoRestorer
    from pgtformer_tpu.models.pgtformer import PGTFormer

    model = PGTFormer(SMALL_PGT)
    x = jnp.zeros((1, 3, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, w=1.0)

    out_path = str(tmp_path / "out.mp4")
    restorer = VideoRestorer(variables, SMALL_PGT, w=1.0, batch_windows=4,
                             dtype=jnp.float32)
    stats = restorer.restore_video(small_video, out_path)
    assert stats["frames"] == 10
    assert os.path.exists(out_path)

    import cv2
    cap = cv2.VideoCapture(out_path)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
    ok, frame = cap.read()
    assert ok and frame.shape == (32, 32, 3)
    cap.release()


def test_video_restorer_multichip_matches_single(small_video, tmp_path):
    """8-device data-parallel serving == single-device restoration."""
    import jax
    from pgtformer_tpu.pipeline import VideoRestorer
    from pgtformer_tpu.models.pgtformer import PGTFormer
    from pgtformer_tpu.parallel.mesh import make_mesh
    import cv2

    model = PGTFormer(SMALL_PGT)
    x = jnp.zeros((1, 3, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, w=1.0)

    out_a = str(tmp_path / "single.mp4")
    out_b = str(tmp_path / "mesh.mp4")
    VideoRestorer(variables, SMALL_PGT, batch_windows=8,
                  dtype=jnp.float32).restore_video(small_video, out_a)
    mesh = make_mesh(8)
    VideoRestorer(variables, SMALL_PGT, batch_windows=8, dtype=jnp.float32,
                  mesh=mesh).restore_video(small_video, out_b)

    def read_all(p):
        cap = cv2.VideoCapture(p)
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f)
        return np.stack(frames)

    fa, fb = read_all(out_a), read_all(out_b)
    assert fa.shape == fb.shape
    # lossy codec in the way: compare loosely but element-aligned
    assert np.mean(np.abs(fa.astype(int) - fb.astype(int))) < 2.0


def test_trainer_loop_checkpoint_resume(tmp_path):
    from pgtformer_tpu.train.stages import Stage1Trainer
    from pgtformer_tpu.train.trainer import Trainer

    trainer_core = Stage1Trainer(SMALL_VQ, FAST_HP, disc=SMALL_DISC)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    state = trainer_core.init_state(jax.random.PRNGKey(0), batch["gt"])

    exp = str(tmp_path / "exp")
    loop = Trainer(trainer_core, exp, print_freq=2, save_checkpoint_freq=3,
                   val_freq=10 ** 9, use_tb_logger=False)

    def batches(n):
        for _ in range(n):
            yield batch["gt"]

    state = loop.fit(state, batches(5), total_iter=5)
    assert int(state.step) == 5
    assert loop.ckpt.latest_step() == 5

    # resume: a fresh state should fast-forward from the checkpoint
    state2 = trainer_core.init_state(jax.random.PRNGKey(1), batch["gt"])
    loop2 = Trainer(trainer_core, exp, print_freq=100,
                    save_checkpoint_freq=100, use_tb_logger=False)
    state2 = loop2.fit(state2, batches(3), total_iter=7)
    assert int(state2.step) == 7


def test_trainer_resume_from_abstract_state(tmp_path):
    """Resume with a jax.eval_shape ABSTRACT template (what train_cli now
    passes when a checkpoint exists, to avoid double device memory)."""
    from pgtformer_tpu.train.stages import Stage1Trainer
    from pgtformer_tpu.train.trainer import Trainer

    trainer_core = Stage1Trainer(SMALL_VQ, FAST_HP, disc=SMALL_DISC)
    rng = np.random.default_rng(0)
    batch = _batch(rng)
    state = trainer_core.init_state(jax.random.PRNGKey(0), batch["gt"])

    exp = str(tmp_path / "exp")
    loop = Trainer(trainer_core, exp, print_freq=100, save_checkpoint_freq=4,
                   val_freq=10 ** 9, use_tb_logger=False)

    def batches(n):
        for _ in range(n):
            yield batch["gt"]

    loop.fit(state, batches(4), total_iter=4)
    assert loop.ckpt.latest_step() == 4

    abstract = jax.eval_shape(
        lambda: trainer_core.init_state(jax.random.PRNGKey(1), batch["gt"]))
    loop2 = Trainer(trainer_core, exp, print_freq=100,
                    save_checkpoint_freq=100, use_tb_logger=False)
    state2 = loop2.fit(abstract, batches(2), total_iter=6)
    assert int(state2.step) == 6
    # re-saving an existing step is idempotent (final-save path)
    loop2.ckpt.save(6, state2)
    loop2.ckpt.save(6, state2)
