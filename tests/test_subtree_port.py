"""Standalone-submodule checkpoint porting (e.g. a separate BiSeNet
face-parse checkpoint into `conditionnet`)."""

import numpy as np
import jax
import jax.numpy as jnp

from pgtformer_tpu.models.parser import BiSeNet
from pgtformer_tpu.convert.torch_port import port_subtree
from tests.conftest import torch_state_dict_to_numpy


def test_port_standalone_bisenet_into_conditionnet(reference):
    import torch
    import flax.linen as nn

    class Wrapper(nn.Module):
        """Stands in for PGTFormer: parser lives under `conditionnet`."""
        @nn.compact
        def __call__(self, x):
            h = BiSeNet(19, name="conditionnet")(x)
            return nn.Dense(4, name="head")(h)

    torch.manual_seed(51)
    ref = reference.pgtformer.BiSeNet(19)
    ref.eval()
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.normal(size=(1, 512, 512, 3)).astype(np.float32))

    mod = Wrapper()
    variables = mod.init(jax.random.PRNGKey(0), x)
    variables = port_subtree(variables, "conditionnet",
                             torch_state_dict_to_numpy(ref))

    parser = BiSeNet(19)
    sub_vars = {col: tree["conditionnet"] for col, tree in variables.items()
                if "conditionnet" in tree}
    out = parser.apply(sub_vars, x)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(
            np.ascontiguousarray(np.asarray(x).transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref_out.numpy(),
        atol=5e-4, rtol=1e-3)


def test_export_roundtrip_and_reference_load(reference, tmp_path):
    """export_torch_state_dict (push_to_hub analog): our variables ->
    reference-format state_dict -> (a) loads into the LIVE torch reference
    with no unexpected keys, (b) round-trips through our own porter
    identically, (c) survives the .pth file format."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch
    import yaml
    from pgtformer_tpu.config import pgtformer_config_from_options
    from pgtformer_tpu.models.pgtformer import PGTFormer
    from pgtformer_tpu.convert.torch_port import (
        export_torch_state_dict, port_torch_state_dict,
        save_reference_checkpoint, load_torch_checkpoint)

    with open("/root/reference/options/"
              "release_test_stage_IIII_dont_need_align_version.yml") as f:
        opt = yaml.safe_load(f)
    cfg = pgtformer_config_from_options(opt)
    mod = PGTFormer(cfg)
    x = jnp.zeros((1, 3, 512, 512, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: mod.init({"params": jax.random.PRNGKey(0)}, x, w=1.0))
    rng = np.random.default_rng(5)
    variables = jax.tree.map(
        lambda s: np.asarray(rng.normal(scale=0.02, size=s.shape), s.dtype)
        if np.issubdtype(s.dtype, np.floating)
        else np.zeros(s.shape, s.dtype), shapes)

    sd = export_torch_state_dict(variables)

    # (a) the torch reference accepts every exported key
    net_kwargs = dict(opt["network_g"])
    net_kwargs.pop("type")
    ref = reference.pgtformer.PGTFormer(**net_kwargs)
    res = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    assert res.unexpected_keys == [], res.unexpected_keys[:10]
    # missing keys must all be recomputed-from-geometry buffers
    for k in res.missing_keys:
        assert ("relative_position_index" in k or "attn_mask" in k
                or "mask" in k), k

    # (b) round-trip through our own porter is exact
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    back = port_torch_state_dict(zeros, sd)
    for col in variables:
        a = jax.tree_util.tree_leaves(variables[col])
        b = jax.tree_util.tree_leaves(back[col])
        for x1, x2 in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x2), np.asarray(x1))

    # (c) .pth file format (params_ema convention)
    p = str(tmp_path / "export.pth")
    save_reference_checkpoint(variables, p)
    sd2 = load_torch_checkpoint(p)
    assert set(sd2) == set(sd)
    np.testing.assert_array_equal(
        sd2["feat_emb.weight"], sd["feat_emb.weight"])


def test_push_to_hub_dry_run(tmp_path):
    """push_to_hub dry path: stages a reference-format pytorch_model.bin +
    config.json that round-trips through the strict porter (the networked
    upload is a plain huggingface_hub.upload_folder on the same folder)."""
    import os
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pgtformer_tpu.config import DDConfig, VQVAEConfig
    from pgtformer_tpu.models.vae import TDCRQVAE3
    from pgtformer_tpu.convert.torch_port import (push_to_hub,
                                                  load_torch_checkpoint,
                                                  port_torch_state_dict)

    dd = dict(double_z=False, z_channels=32, resolution=16, in_channels=3,
              out_ch=3, ch=32, ch_mult=[1, 2], depths=[1, 1],
              num_heads=[2, 2], window_sizes=[[4, 4], [4, 4]], num_frames=3,
              num_res_blocks=1, attn_resolutions=[8], dropout=0.0)
    cfg = VQVAEConfig.from_dict(dict(
        embed_dim=32, n_embed=32, decay=0.99, loss_type="mse",
        latent_loss_weight=0.25, bottleneck_type="rq",
        latent_shape=[8, 8, 32], code_shape=[8, 8, 1],
        shared_codebook=True, restart_unused_codes=True, tf=3,
        ddconfig=dd))
    mod = TDCRQVAE3(cfg)
    x = jnp.zeros((1, 3, 16, 16, 3), jnp.float32)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x)

    staged = push_to_hub(variables, "someone/some-repo",
                         staging_dir=str(tmp_path / "stage"), dry_run=True)
    assert os.path.exists(os.path.join(staged, "pytorch_model.bin"))
    assert os.path.exists(os.path.join(staged, "config.json"))
    sd = load_torch_checkpoint(os.path.join(staged, "pytorch_model.bin"),
                               param_key=None)
    zeros = jax.tree.map(np.zeros_like, variables)
    restored = port_torch_state_dict(zeros, sd)   # strict: every leaf filled
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
