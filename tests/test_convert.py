"""PyTorch→JAX checkpoint converter round trip.

torchvision/monai are absent here, so the reference model can't be
instantiated; instead we synthesize a torch-layout state dict by inverting
the converter's documented transforms from a tiny flax init, convert it, and
require an exact tree/shape/value match. This pins the name mapping
(reference ``models/ours.py:1717-1747``) against our parameter tree.
"""

import jax
import jax.numpy as jnp
import numpy as np

from glfusion_tpu.config import tiny_config
from glfusion_tpu.models import GlobalAndLocal
from glfusion_tpu.utils.torch_convert import convert_state_dict


def _inv_conv(kernel_v):  # (kh, kw, I, O) → (O, I, kh, kw)
    return np.transpose(np.asarray(kernel_v), (3, 2, 0, 1))


def _inv_dense(kernel):  # (I, O) → (O, I, 1, 1, 1)
    k = np.transpose(np.asarray(kernel), (1, 0))
    return k[:, :, None, None, None]


def fake_reference_state_dict(variables, cfg):
    """Emit the reference's torch key space from our flax tree."""
    p = variables["params"]
    s = variables["batch_stats"]
    views = list(cfg.views)
    sd = {}

    def put_conv(tkeys, node, stats=None, bias=True):
        for vi, tk in enumerate(tkeys):
            sd[tk + ".weight"] = _inv_conv(node["kernel"][vi])
            if bias:
                sd[tk + ".bias"] = np.asarray(node["bias"][vi])

    def put_bn(tkeys, node, snode):
        for vi, tk in enumerate(tkeys):
            sd[tk + ".weight"] = np.asarray(node["scale"][vi])
            sd[tk + ".bias"] = np.asarray(node["bias"][vi])
            sd[tk + ".running_mean"] = np.asarray(snode["mean"][vi])
            sd[tk + ".running_var"] = np.asarray(snode["var"][vi])

    bb, bbs = p["backbone"], s["backbone"]
    put_conv([f"init_block.{v}.0" for v in views], bb["stem_conv"])
    put_bn([f"init_block.{v}.1" for v in views], bb["stem_bn"],
           bbs["stem_bn"])
    for st, blocks in enumerate(cfg.block_sizes, start=1):
        for b in range(blocks):
            blk = bb[f"layer{st}_block{b}"]
            blks = bbs[f"layer{st}_block{b}"]
            for j in (1, 2, 3):
                put_conv([f"layer{st}.{v}.{b}.conv{j}" for v in views],
                         blk[f"conv{j}"], bias=False)
                put_bn([f"layer{st}.{v}.{b}.bn{j}" for v in views],
                       blk[f"bn{j}"], blks[f"bn{j}"])
            if "downsample_conv" in blk:
                put_conv([f"layer{st}.{v}.{b}.downsample.0" for v in views],
                         blk["downsample_conv"], bias=False)
                put_bn([f"layer{st}.{v}.{b}.downsample.1" for v in views],
                       blk["downsample_bn"], blks["downsample_bn"])

    for troot, froot in (("classifier", "classifier"),
                         ("centerness", "centerness")):
        h, hs = p[froot], s[froot]
        a, as_ = h["aspp"], hs["aspp"]
        put_conv([f"{troot}.{v}.0.convs.0.0" for v in views], a["b0_conv"],
                 bias=False)
        put_bn([f"{troot}.{v}.0.convs.0.1" for v in views], a["b0_bn"],
               as_["b0_bn"])
        for i in range(len(cfg.aspp_rates)):
            put_conv([f"{troot}.{v}.0.convs.{i + 1}.0" for v in views],
                     a[f"b{i + 1}_conv"], bias=False)
            put_bn([f"{troot}.{v}.0.convs.{i + 1}.1" for v in views],
                   a[f"b{i + 1}_bn"], as_[f"b{i + 1}_bn"])
        n = len(cfg.aspp_rates) + 1
        put_conv([f"{troot}.{v}.0.convs.{n}.1" for v in views],
                 a["pool_conv"], bias=False)
        put_bn([f"{troot}.{v}.0.convs.{n}.2" for v in views], a["pool_bn"],
               as_["pool_bn"])
        put_conv([f"{troot}.{v}.0.project.0" for v in views],
                 a["project_conv"], bias=False)
        put_bn([f"{troot}.{v}.0.project.1" for v in views], a["project_bn"],
               as_["project_bn"])
        put_conv([f"{troot}.{v}.1" for v in views], h["conv"], bias=False)
        put_bn([f"{troot}.{v}.2" for v in views], h["bn"], hs["bn"])
        put_conv([f"{troot}.{v}.4" for v in views], h["out_conv"])

    for attn in ("global_attn", "local_attn"):
        t = p[attn]
        for nm in ("theta", "phi", "g"):
            sd[f"{attn}.{nm}.weight"] = _inv_dense(t[nm]["kernel"])
            sd[f"{attn}.{nm}.bias"] = np.asarray(t[nm]["bias"])
        sd[f"{attn}.W_z.0.weight"] = _inv_dense(t["w_z_conv"]["kernel"])
        sd[f"{attn}.W_z.0.bias"] = np.asarray(t["w_z_conv"]["bias"])
        sd[f"{attn}.W_z.1.weight"] = np.asarray(t["w_z_bn"]["scale"])
        sd[f"{attn}.W_z.1.bias"] = np.asarray(t["w_z_bn"]["bias"])
        sd[f"{attn}.W_z.1.running_mean"] = np.asarray(
            s[attn]["w_z_bn"]["mean"])
        sd[f"{attn}.W_z.1.running_var"] = np.asarray(s[attn]["w_z_bn"]["var"])
        sd[f"{attn}.norm_layer.weight"] = np.asarray(t["norm"]["scale"])
        sd[f"{attn}.norm_layer.bias"] = np.asarray(t["norm"]["bias"])

    # the constructor-artifact template + dead audio path must be ignored
    sd["network.backbone.conv1.weight"] = np.zeros((4, 1, 7, 7))
    sd["global_attn.align_channel.weight"] = np.zeros((8, 128))
    return sd


def test_convert_round_trip_exact():
    cfg = tiny_config().model
    model = GlobalAndLocal(cfg)
    x = jnp.zeros((cfg.num_views, 1, 32, 32, 1))
    # random-ish init so the round trip is non-trivial
    variables = model.init(jax.random.PRNGKey(7), x, False)
    sd = fake_reference_state_dict(variables, cfg)

    converted = convert_state_dict(sd, cfg)

    ref_flat = jax.tree_util.tree_leaves_with_path(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]})
    got = {"params": converted["params"],
           "batch_stats": converted["batch_stats"]}
    got_flat = dict(jax.tree_util.tree_leaves_with_path(got))
    assert len(ref_flat) == len(got_flat)
    for path, leaf in ref_flat:
        assert path in got_flat, f"missing {path}"
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(got_flat[path]),
                                   err_msg=str(path))


def test_converted_params_run_forward():
    cfg = tiny_config().model
    model = GlobalAndLocal(cfg)
    x = jnp.zeros((cfg.num_views, 1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(7), x, False)
    sd = fake_reference_state_dict(variables, cfg)
    converted = convert_state_dict(sd, cfg)
    out = model.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]}, x, False)
    assert out["mask"].shape == (cfg.num_views, 1, 32, 32, 5)


def test_cli_torch_ckpt_ingestion(tmp_path):
    """--torch-ckpt on the main CLI (VERDICT r2 #8): a reference-layout
    .pth (torch.save({'network': sd})) loads through Trainer so the day
    the released checkpoint is obtainable, Dice parity is one command."""
    import torch

    from glfusion_tpu.data.synthetic import generate_synthetic_dataset
    from glfusion_tpu.train.trainer import Trainer

    cfg = tiny_config()
    paths = generate_synthetic_dataset(str(tmp_path / "data"), cfg.data,
                                       views=cfg.model.views, seed=0)
    model = GlobalAndLocal(cfg.model)
    x = jnp.zeros((cfg.model.num_views, 1, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(11), x, False)
    sd = fake_reference_state_dict(variables, cfg.model)
    # eval-side checkpoints carry the DataParallel 'module.' prefix
    # (reference main.py:456)
    pth = tmp_path / "net_00042.pth"
    torch.save({"network": {f"module.{k}": torch.from_numpy(np.asarray(v))
                            for k, v in sd.items()}}, pth)

    trainer = Trainer(cfg, data_paths=paths, verbose=False)
    trainer.load_torch_checkpoint(str(pth))
    got = np.asarray(
        trainer.state.params["global_attn"]["theta"]["kernel"])
    want = np.asarray(variables["params"]["global_attn"]["theta"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    # the converted weights drive the real eval path
    report = trainer.validation_and_test()
    assert "Inner-val" in report
