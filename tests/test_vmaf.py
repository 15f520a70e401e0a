"""Clean-room VMAF (eval/vmaf.py): SVR model parsing + feature sanity.

The reference ships the model JSONs (ffmpeg_lib/model/) for libvmaf-based
encoded-quality measurement; no libvmaf exists in this environment, so the
features are reimplemented from the published algorithms and labeled
`vmaf(own-impl)` (see module docstring)."""

import numpy as np
import pytest

from pgtformer_tpu.eval import vmaf as V


pytestmark = pytest.mark.skipif(not V.available(),
                                reason="reference model JSON not present")


def _test_image(n=160):
    x, y = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    img = (0.5 + 0.3 * np.sin(8 * x * np.pi) * np.cos(5 * y * np.pi)
           + 0.15 * np.sin(40 * x * np.pi) * np.sin(33 * y * np.pi)
           + 0.2 * x)
    return np.clip(img, 0, 1)[..., None].repeat(3, -1)


def test_model_parse():
    m = V.VmafModel()
    assert [V.VmafModel._short(n) for n in m.feature_names] == [
        "adm2", "motion2", "vif_scale0", "vif_scale1", "vif_scale2",
        "vif_scale3"]
    assert m.svs.shape[0] == 211 and m.gamma == pytest.approx(0.04)


def test_perfect_reconstruction_scores_100():
    img = _test_image()
    sc = V.VmafScorer()
    for t in range(3):
        r = np.roll(img, t, axis=0)
        sc.update(r, r)
    assert sc.mean() == pytest.approx(100.0, abs=1.0)
    # features themselves at their ideal values
    vifs = V.vif_features(V.rgb_to_luma(img), V.rgb_to_luma(img))
    assert all(v == pytest.approx(1.0, abs=1e-6) for v in vifs)
    assert V.adm_feature(V.rgb_to_luma(img), V.rgb_to_luma(img)) == \
        pytest.approx(1.0, abs=1e-9)


def test_monotone_under_degradation():
    import cv2
    img = _test_image()
    scores = []
    for k in (0, 3, 9, 21):
        sc = V.VmafScorer()
        for t in range(3):
            r = np.roll(img, t, axis=0)
            d = r if k == 0 else cv2.GaussianBlur(r, (k, k), 0)
            sc.update(r, d)
        scores.append(sc.mean())
    assert scores == sorted(scores, reverse=True), scores
    assert scores[0] > 95 and scores[-1] < 50


def test_motion2_uses_min_of_neighbors():
    img = V.rgb_to_luma(_test_image())
    still = V._sep_filter(img, V._FILTER5)
    moved = V._sep_filter(np.roll(img, 5, axis=1), V._FILTER5)
    m2, _ = V.motion_feature(still, img, moved)
    # min(0 to prev, big to next) = ~0
    assert m2 == pytest.approx(0.0, abs=1e-9)
    m2b, _ = V.motion_feature(moved, img, moved)
    assert m2b > 1.0
