"""Numerical parity vs torch: spec-built torch modules (ldm architecture,
written here from the spec — NOT copied) are run on CPU, their state_dicts
converted via utils.torch_compat, and outputs compared against this package's
flax modules. This is the checkpoint-parity guarantee of BASELINE.json
("match per-patch outputs to tolerance") without needing the (dead-link)
published checkpoints.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from generative_detection_tpu.models.blocks import (  # noqa: E402
    AttnBlock,
    Decoder,
    Encoder,
    ResnetBlock,
)
from generative_detection_tpu.models.pose_modules import (  # noqa: E402
    PoseDecoderSpatialVAE,
    PoseEncoderSpatialVAE,
)
from generative_detection_tpu.utils.torch_compat import (  # noqa: E402
    convert_backbone,
    _attn_block,
    _dense,
    _resnet_block,
)

torch.manual_seed(0)


# ---- spec-built torch reference modules (ldm semantics) ----------------------

def t_norm(c):
    return tnn.GroupNorm(num_groups=32, num_channels=c, eps=1e-6, affine=True)


class TResnetBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = t_norm(cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1)
        self.norm2 = t_norm(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1)
        self.has_sc = cin != cout
        if self.has_sc:
            self.nin_shortcut = tnn.Conv2d(cin, cout, 1, 1, 0)

    def forward(self, x):
        h = self.conv1(tF.silu(self.norm1(x)))
        h = self.conv2(tF.silu(self.norm2(h)))
        if self.has_sc:
            x = self.nin_shortcut(x)
        return x + h


class TAttnBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = t_norm(c)
        self.q = tnn.Conv2d(c, c, 1)
        self.k = tnn.Conv2d(c, c, 1)
        self.v = tnn.Conv2d(c, c, 1)
        self.proj_out = tnn.Conv2d(c, c, 1)

    def forward(self, x):
        h = self.norm(x)
        q, k, v = self.q(h), self.k(h), self.v(h)
        b, c, hh, ww = q.shape
        q = q.reshape(b, c, hh * ww).permute(0, 2, 1)
        k = k.reshape(b, c, hh * ww)
        w = torch.softmax(torch.bmm(q, k) * (c**-0.5), dim=2)
        v = v.reshape(b, c, hh * ww)
        out = torch.bmm(v, w.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(out)


class TDownsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, 2, 0)

    def forward(self, x):
        return self.conv(tF.pad(x, (0, 1, 0, 1)))


class TUpsample(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = tnn.Conv2d(c, c, 3, 1, 1)

    def forward(self, x):
        return self.conv(tF.interpolate(x, scale_factor=2.0, mode="nearest"))


class TEncoder(tnn.Module):
    def __init__(self, dd):
        super().__init__()
        ch, mult = dd["ch"], dd["ch_mult"]
        self.conv_in = tnn.Conv2d(dd["in_channels"], ch, 3, 1, 1)
        in_mult = (1,) + tuple(mult)
        curr_res = dd["resolution"]
        self.down = tnn.ModuleList()
        for i in range(len(mult)):
            level = tnn.Module()
            level.block = tnn.ModuleList()
            level.attn = tnn.ModuleList()
            cin, cout = ch * in_mult[i], ch * mult[i]
            for _ in range(dd["num_res_blocks"]):
                level.block.append(TResnetBlock(cin, cout))
                cin = cout
                if curr_res in dd["attn_resolutions"]:
                    level.attn.append(TAttnBlock(cout))
            if i != len(mult) - 1:
                level.downsample = TDownsample(cout)
                curr_res //= 2
            self.down.append(level)
        cfin = ch * mult[-1]
        self.mid = tnn.Module()
        self.mid.block_1 = TResnetBlock(cfin, cfin)
        self.mid.attn_1 = TAttnBlock(cfin)
        self.mid.block_2 = TResnetBlock(cfin, cfin)
        self.norm_out = t_norm(cfin)
        out_c = 2 * dd["z_channels"] if dd["double_z"] else dd["z_channels"]
        self.conv_out = tnn.Conv2d(cfin, out_c, 3, 1, 1)
        self.dd = dd

    def forward(self, x):
        h = self.conv_in(x)
        curr_res = self.dd["resolution"]
        for i, level in enumerate(self.down):
            for j, blk in enumerate(level.block):
                h = blk(h)
                if level.attn:
                    h = level.attn[j](h)
            if hasattr(level, "downsample"):
                h = level.downsample(h)
                curr_res //= 2
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(tF.silu(self.norm_out(h)))


class TDecoder(tnn.Module):
    def __init__(self, dd):
        super().__init__()
        ch, mult = dd["ch"], dd["ch_mult"]
        cfin = ch * mult[-1]
        self.conv_in = tnn.Conv2d(dd["z_channels"], cfin, 3, 1, 1)
        self.mid = tnn.Module()
        self.mid.block_1 = TResnetBlock(cfin, cfin)
        self.mid.attn_1 = TAttnBlock(cfin)
        self.mid.block_2 = TResnetBlock(cfin, cfin)
        curr_res = dd["resolution"] // 2 ** (len(mult) - 1)
        self.up = tnn.ModuleList([tnn.Module() for _ in mult])
        cin = cfin
        for i in reversed(range(len(mult))):
            level = self.up[i]
            level.block = tnn.ModuleList()
            level.attn = tnn.ModuleList()
            cout = ch * mult[i]
            for _ in range(dd["num_res_blocks"] + 1):
                level.block.append(TResnetBlock(cin, cout))
                cin = cout
                if curr_res in dd["attn_resolutions"]:
                    level.attn.append(TAttnBlock(cout))
            if i != 0:
                level.upsample = TUpsample(cout)
                curr_res *= 2
        self.norm_out = t_norm(ch * mult[0])
        self.conv_out = tnn.Conv2d(ch * mult[0], dd["out_ch"], 3, 1, 1)
        self.dd = dd

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for i in reversed(range(len(self.up))):
            level = self.up[i]
            for j, blk in enumerate(level.block):
                h = blk(h)
                if level.attn:
                    h = level.attn[j](h)
            if hasattr(level, "upsample"):
                h = level.upsample(h)
        return self.conv_out(tF.silu(self.norm_out(h)))


def nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def sd_np(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


# ---- tests --------------------------------------------------------------------

def test_resnet_block_parity(rng):
    tm = TResnetBlock(32, 64).eval()
    x = rng.normal(size=(2, 8, 8, 32)).astype(np.float32)
    with torch.no_grad():
        want = nhwc(tm(torch.from_numpy(nchw(x))).numpy())
    sd = {f"m.{k}": v for k, v in sd_np(tm).items()}
    params = _resnet_block(sd, "m", True)
    fm = ResnetBlock(64)
    got = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_attn_block_parity(rng):
    tm = TAttnBlock(64).eval()
    x = rng.normal(size=(1, 8, 8, 64)).astype(np.float32)
    with torch.no_grad():
        want = nhwc(tm(torch.from_numpy(nchw(x))).numpy())
    sd = {f"m.{k}": v for k, v in sd_np(tm).items()}
    params = _attn_block(sd, "m")
    got = np.asarray(AttnBlock().apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


DD = {
    "double_z": True,
    "z_channels": 16,
    "resolution": 32,
    "in_channels": 3,
    "out_ch": 3,
    "ch": 32,
    "ch_mult": [1, 2],
    "num_res_blocks": 2,
    "attn_resolutions": [16],
    "dropout": 0.0,
}


def test_encoder_parity(rng):
    tm = TEncoder(DD).eval()
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = nhwc(tm(torch.from_numpy(nchw(x))).numpy())
    sd = {f"encoder.{k}": v for k, v in sd_np(tm).items()}
    params = convert_backbone(sd, "encoder", DD, is_encoder=True)
    got = np.asarray(Encoder(DD).apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_decoder_parity(rng):
    tm = TDecoder(DD).eval()
    z = rng.normal(size=(1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want = nhwc(tm(torch.from_numpy(nchw(z))).numpy())
    sd = {f"decoder.{k}": v for k, v in sd_np(tm).items()}
    params = convert_backbone(sd, "decoder", DD, is_encoder=False)
    got = np.asarray(Decoder(DD).apply({"params": params}, jnp.asarray(z)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_full_model_mode_path_parity(rng):
    """Assemble the full torch PoseAutoencoder compute path (encode ->
    quant convs -> mode -> pose decode(mode) -> pose re-encode -> decode),
    convert the whole state_dict, and compare against this package's modules
    end to end (deterministic mode path, no dropout/noise)."""
    from generative_detection_tpu.models.autoencoder import PoseAutoencoderNet
    from generative_detection_tpu.utils.torch_compat import convert_pose_autoencoder

    dd = dict(DD)
    enc = TEncoder(dd).eval()
    dec = TDecoder(dd).eval()
    quant_obj = tnn.Conv2d(32, 32, 1)
    quant_pose = tnn.Conv2d(32, 16, 1)
    post_quant = tnn.Conv2d(16, 16, 1)
    pd_layers = tnn.Sequential(
        tnn.Linear(4096, 500), tnn.Tanh(), tnn.Linear(500, 500), tnn.Tanh(),
        tnn.Linear(500, 27),
    )
    pe_coord = tnn.Linear(512, 1024)
    pe_latent = tnn.Linear(19, 4, bias=False)
    pe_mlp1 = tnn.Linear(1024, 500)
    pe_mlp2 = tnn.Linear(500, 4096)

    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(nchw(x))
        h = enc(xt)
        moments = quant_obj(h)
        mean = moments[:, :16]
        pose_feat = quant_pose(h)
        flat = pose_feat.reshape(2, -1)
        zp = pd_layers(flat)
        bbox_mu = zp[:, :8]
        c_pred = zp[:, -11:]
        dec_pose_t = torch.cat([bbox_mu, c_pred], dim=-1)  # mode path
        # pose re-encode
        xg = np.linspace(-1, 1, 16)
        yg = np.linspace(1, -1, 16)
        g0, g1 = np.meshgrid(xg, yg)
        coords = torch.from_numpy(
            np.stack([g0.ravel(), g1.ravel()], 1).astype(np.float32)
        )
        cx = coords.expand(2, 256, 2).reshape(2, 512)
        h_x = pe_coord(cx)
        h_z = pe_latent(dec_pose_t).unsqueeze(1).expand(2, 256, 4).reshape(2, 1024)
        enc_pose_flat = pe_mlp2(tF.silu(pe_mlp1(tF.silu(h_x + h_z))))
        enc_pose = enc_pose_flat.reshape(2, 16, 16, 16)  # NCHW
        z = mean + enc_pose
        want = nhwc(dec(post_quant(z)).numpy())
        want_pose = dec_pose_t.numpy()

    sd = {}
    for prefix, mod in [
        ("encoder", enc), ("decoder", dec), ("quant_conv_obj", quant_obj),
        ("quant_conv_pose", quant_pose), ("post_quant_conv", post_quant),
    ]:
        for k, v in mod.state_dict().items():
            key = f"{prefix}.{k}" if prefix not in ("quant_conv_obj", "quant_conv_pose", "post_quant_conv") else f"{prefix}.{k}"
            sd[key] = v.detach().numpy()
    for i, l in enumerate(pd_layers):
        if isinstance(l, tnn.Linear):
            for p, v in l.state_dict().items():
                sd[f"pose_decoder.layers.{i}.{p}"] = v.detach().numpy()
    for name, mod in [("coord_linear", pe_coord), ("latent_linear", pe_latent),
                      ("layers.1", pe_mlp1), ("layers.3", pe_mlp2)]:
        for p, v in mod.state_dict().items():
            sd[f"pose_encoder.{name}.{p}"] = v.detach().numpy()

    net_params, _ = convert_pose_autoencoder(sd, dd)
    net = PoseAutoencoderNet(
        ddconfig=dd, embed_dim=16, num_classes=11,
        encoder_pretrain_steps=0, add_noise_to_z_obj=False,
        dropout_prob_init=0.0, dropout_prob_final=0.0,
    )
    variables = {"params": net_params}
    xj = jnp.asarray(x)
    posterior, pose_feat_j = net.apply(variables, xj, method=net.encode)
    dec_pose_j, _ = net.apply(
        variables, pose_feat_j, False, method=net._decode_pose,
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(np.asarray(dec_pose_j), want_pose, rtol=1e-3, atol=1e-4)
    enc_pose_j = net.apply(variables, dec_pose_j, method=net._encode_pose)
    out_j = net.apply(
        variables, posterior.mode() + enc_pose_j, method=net.decode
    )
    np.testing.assert_allclose(np.asarray(out_j), want, rtol=1e-3, atol=5e-4)


def test_pose_mlp_parity(rng):
    # torch pose decoder: Linear(4096,500) tanh Linear(500,500) tanh Linear(500,27)
    layers = tnn.Sequential(
        tnn.Linear(4096, 500), tnn.Tanh(), tnn.Linear(500, 500), tnn.Tanh(),
        tnn.Linear(500, 27),
    )
    x = rng.normal(size=(2, 4096)).astype(np.float32)
    with torch.no_grad():
        want = layers(torch.from_numpy(x)).numpy()
    sd = {f"pose_decoder.layers.{i}.{p}": v.detach().numpy()
          for i, l in enumerate(layers) if isinstance(l, tnn.Linear)
          for p, v in l.state_dict().items()}
    params = {
        "fc_in": _dense(sd, "pose_decoder.layers.0"),
        "fc_1": _dense(sd, "pose_decoder.layers.2"),
        "fc_out": _dense(sd, "pose_decoder.layers.4"),
    }
    got = np.asarray(
        PoseDecoderSpatialVAE(num_classes=11).apply({"params": params}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pose_encoder_parity(rng):
    # torch side per ref pose_encoder.py:59-131
    coord_linear = tnn.Linear(512, 1024)
    latent_linear = tnn.Linear(19, 4, bias=False)
    mlp1 = tnn.Linear(1024, 500)
    mlp2 = tnn.Linear(500, 4096)
    z = rng.normal(size=(3, 19)).astype(np.float32)

    xg = np.linspace(-1, 1, 16)
    yg = np.linspace(1, -1, 16)
    x0, x1 = np.meshgrid(xg, yg)
    coords = np.stack([x0.ravel(), x1.ravel()], 1).astype(np.float32)
    with torch.no_grad():
        b = z.shape[0]
        x = torch.from_numpy(coords).expand(b, 256, 2).reshape(b, 512)
        h_x = coord_linear(x)
        h_z = latent_linear(torch.from_numpy(z))
        h_z = h_z.unsqueeze(1).expand(b, 256, 4).reshape(b, 1024)
        h = tF.silu(h_x + h_z)
        want = mlp2(tF.silu(mlp1(h))).numpy()

    sd = {}
    for name, mod in [("coord_linear", coord_linear), ("latent_linear", latent_linear),
                      ("layers.1", mlp1), ("layers.3", mlp2)]:
        for p, v in mod.state_dict().items():
            sd[f"pose_encoder.{name}.{p}"] = v.detach().numpy()
    params = {
        "coord_linear": _dense(sd, "pose_encoder.coord_linear"),
        "latent_linear": _dense(sd, "pose_encoder.latent_linear", bias=False),
        "fc_1": _dense(sd, "pose_encoder.layers.1"),
        "fc_out": _dense(sd, "pose_encoder.layers.3"),
    }
    got = np.asarray(
        PoseEncoderSpatialVAE(num_classes=11).apply({"params": params}, jnp.asarray(z))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lpips_parity_synthetic_weights(rng, tmp_path):
    """LPIPS architecture parity vs a spec-built torch LPIPS (taming's
    ScalingLayer + VGG16 feature taps + 1x1 no-bias lin heads, ref
    contperceptual.py:143-145) with SYNTHETIC weights routed through the
    exact tools/convert_lpips.py layout. Pretrained weights are unavailable
    in this environment (no egress); this pins the architecture + converter
    so dropping in the real vgg16/vgg.pth checkpoints is weight-load-only."""
    from generative_detection_tpu.models.lpips import LPIPS, load_lpips_weights

    # torch VGG16 feature extractor from the spec (conv plan + tap points)
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
            512, 512, 512]
    layers, convs = [], []
    cin = 3
    for item in plan:
        if item == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            conv = tnn.Conv2d(cin, item, 3, padding=1)
            convs.append(conv)
            layers.append(conv)
            layers.append(tnn.ReLU())
            cin = item
    features = tnn.Sequential(*layers)
    tap_after_conv = (2, 4, 7, 10, 13)
    tap_channels = (64, 128, 256, 512, 512)
    lins = [tnn.Conv2d(c, 1, 1, bias=False) for c in tap_channels]
    torch.manual_seed(3)
    for m in convs + lins:
        tnn.init.normal_(m.weight, std=0.05)
        if m.bias is not None:
            tnn.init.normal_(m.bias, std=0.05)

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def t_norm_tensor(x, eps=1e-10):
        n = torch.sqrt(torch.sum(x ** 2, dim=1, keepdim=True))
        return x / (n + eps)

    def torch_lpips(a, b):
        taps_a, taps_b = [], []
        for inp, taps in ((a, taps_a), (b, taps_b)):
            h = (inp - shift) / scale
            ci = 0
            for lay in features:
                h = lay(h)
                if isinstance(lay, tnn.Conv2d):
                    ci += 1
                elif isinstance(lay, tnn.ReLU) and ci in tap_after_conv:
                    taps.append(h)
        total = 0.0
        for i, (ta, tb) in enumerate(zip(taps_a, taps_b)):
            d = (t_norm_tensor(ta) - t_norm_tensor(tb)) ** 2
            total = total + lins[i](d).mean(dim=(2, 3), keepdim=True)
        return total

    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.5
    y = rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = torch_lpips(
            torch.from_numpy(nchw(x)), torch.from_numpy(nchw(y))
        ).numpy()

    # export through the converter's .npz layout
    def t2f(w):
        return np.transpose(w.detach().numpy(), (2, 3, 1, 0))

    flat = {}
    for i, conv in enumerate(convs, start=1):
        flat[f"vgg/conv{i}/kernel"] = t2f(conv.weight)
        flat[f"vgg/conv{i}/bias"] = conv.bias.detach().numpy()
    for i, lin in enumerate(lins):
        flat[f"lin{i}/kernel"] = t2f(lin.weight)
    npz = tmp_path / "lpips_synthetic.npz"
    np.savez(npz, **flat)

    model = LPIPS()
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(y)
    )["params"]
    params = load_lpips_weights(params, str(npz))
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1), rtol=1e-4, atol=1e-5)
