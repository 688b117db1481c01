"""Unit parity tests for the op layer against PyTorch reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sod100k_tpu.ops import (
    avg_pool,
    batchnorm_infer,
    batchnorm_train,
    conv2d,
    conv2d_x100,
    goct_conv,
    groupnorm,
    max_pool,
    prelu,
    resize_bilinear,
    upsample_bilinear,
)

RNG = np.random.default_rng(42)


def nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def nhwc(x):
    return jnp.asarray(np.asarray(x).transpose(0, 2, 3, 1))


@pytest.mark.parametrize("factor", [2, 4, 8])
def test_upsample_bilinear_matches_torch(factor):
    x = RNG.standard_normal((2, 5, 7, 9), dtype=np.float32)
    want = F.interpolate(torch.from_numpy(x), scale_factor=factor, mode="bilinear").numpy()
    got = nchw(upsample_bilinear(nhwc(x), factor))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("size", [(10, 6), (3, 5), (17, 13)])
def test_resize_bilinear_matches_torch(size):
    x = RNG.standard_normal((2, 4, 7, 9), dtype=np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=size, mode="bilinear", align_corners=False
    ).numpy()
    got = nchw(resize_bilinear(nhwc(x), size))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pools_match_torch():
    x = RNG.standard_normal((2, 6, 9, 11), dtype=np.float32)
    np.testing.assert_allclose(
        nchw(max_pool(nhwc(x), 2)),
        F.max_pool2d(torch.from_numpy(x), 2, stride=2).numpy(),
        atol=0,
    )
    np.testing.assert_allclose(
        nchw(avg_pool(nhwc(x), 2)),
        F.avg_pool2d(torch.from_numpy(x), (2, 2), stride=2).numpy(),
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "stride,padding,dilation,groups",
    [(1, 1, 1, 1), (2, 1, 1, 1), (1, 4, 4, 1), (1, 1, 1, 6)],
)
def test_conv2d_matches_torch(stride, padding, dilation, groups):
    cin, cout = 6, 12
    x = RNG.standard_normal((2, cin, 13, 15), dtype=np.float32)
    w = RNG.standard_normal((cout, cin // groups, 3, 3), dtype=np.float32) * 0.2
    b = RNG.standard_normal(cout, dtype=np.float32)
    want = F.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride, padding, dilation, groups,
    ).numpy()
    got = nchw(
        conv2d(nhwc(x), jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b),
               stride=stride, padding=padding, dilation=dilation, groups=groups)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv2d_x100_scale():
    x = RNG.standard_normal((1, 4, 8, 8), dtype=np.float32)
    w = RNG.standard_normal((4, 1, 3, 3), dtype=np.float32) * 0.01
    want = F.conv2d(torch.from_numpy(x), 100.0 * torch.from_numpy(w), None, 1, 1, 1, 4).numpy()
    got = nchw(conv2d_x100(nhwc(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                           padding=1, groups=4))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv2d_circular_padding_matches_reference_branch():
    """Conv2dX100's circular branch (conv2d.py:84-94): torch's asymmetric
    expanded_padding + F.pad(mode='circular') + unpadded conv."""
    x = RNG.standard_normal((2, 5, 12, 14), dtype=np.float32)
    w = RNG.standard_normal((7, 5, 3, 3), dtype=np.float32) * 0.05
    for pad in (1, 2, 3):
        expanded = ((pad + 1) // 2, pad // 2, (pad + 1) // 2, pad // 2)
        want = F.conv2d(
            F.pad(torch.from_numpy(x), expanded, mode="circular"),
            100.0 * torch.from_numpy(w), None, 1, 0).numpy()
        got = nchw(conv2d_x100(
            nhwc(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
            padding=pad, padding_mode="circular"))
        np.testing.assert_allclose(got, want, atol=1e-3)


def test_batchnorm_infer_and_prelu_match_torch():
    c = 9
    torch.manual_seed(0)  # decouple from other tests' torch RNG usage
    x = RNG.standard_normal((2, c, 6, 7), dtype=np.float32)
    bn = torch.nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.randn(c))
        bn.bias.copy_(torch.randn(c))
        bn.running_mean.copy_(torch.randn(c))
        bn.running_var.copy_(torch.rand(c) + 0.3)
    pr = torch.nn.PReLU(c)
    with torch.no_grad():
        pr.weight.copy_(torch.randn(c) * 0.3)
    want = pr(bn(torch.from_numpy(x))).detach().numpy()
    p = {
        "scale": jnp.asarray(bn.weight.detach().numpy()),
        "offset": jnp.asarray(bn.bias.detach().numpy()),
        "mean": jnp.asarray(bn.running_mean.numpy()),
        "var": jnp.asarray(bn.running_var.numpy()),
    }
    got = nchw(prelu(batchnorm_infer(nhwc(x), p), jnp.asarray(pr.weight.detach().numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batchnorm_train_matches_torch():
    c = 5
    torch.manual_seed(1)
    x = RNG.standard_normal((4, c, 6, 7), dtype=np.float32)
    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.randn(c))
        bn.bias.copy_(torch.randn(c))
        bn.running_mean.copy_(torch.randn(c))
        bn.running_var.copy_(torch.rand(c) + 0.3)
    # .copy(): jnp.asarray may zero-copy alias the torch-owned numpy views on
    # CPU, and the train-mode forward below mutates running stats in place
    p = {
        "scale": jnp.asarray(bn.weight.detach().numpy().copy()),
        "offset": jnp.asarray(bn.bias.detach().numpy().copy()),
        "mean": jnp.asarray(bn.running_mean.numpy().copy()),
        "var": jnp.asarray(bn.running_var.numpy().copy()),
    }
    want = bn(torch.from_numpy(x)).detach().numpy()  # train mode
    got, stats = batchnorm_train(nhwc(x), p)
    np.testing.assert_allclose(nchw(got), want, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats["mean"]), bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]), bn.running_var.numpy(), atol=1e-4)


def test_groupnorm_matches_torch():
    c, g = 64, 32
    torch.manual_seed(2)
    x = RNG.standard_normal((2, c, 6, 7), dtype=np.float32)
    gn = torch.nn.GroupNorm(g, c)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(c))
        gn.bias.copy_(torch.randn(c))
    want = gn(torch.from_numpy(x)).detach().numpy()
    p = {"scale": jnp.asarray(gn.weight.detach().numpy()),
         "offset": jnp.asarray(gn.bias.detach().numpy())}
    got = nchw(groupnorm(nhwc(x), p, num_groups=g))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize(
    "in_split,out_split,k,stride",
    [((13, 10), (13, 12), 1, 1), ((3,), (13, 10), 3, 1),
     ((18, 12), (28, 21), 3, 2), ((51, 38, 64), (17, 38, 32), 1, 1)],
)
def test_goct_conv_matches_reference_semantics(in_split, out_split, k, stride,
                                               ref_csnet):
    """Oracle is the LIVE reference gOctaveConv class (csnet.py:954-1076),
    driven with alpha fractions that int(round(...)) back to the exact
    integer splits."""
    pad = 1 if k == 3 else 0
    h = 32
    cin, cout = sum(in_split), sum(out_split)
    xs = []
    for i, c in enumerate(in_split):
        xs.append(RNG.standard_normal((2, c, h // 2**i, h // 2**i), dtype=np.float32))
    w = RNG.standard_normal((cout, cin, k, k), dtype=np.float32) * 0.2
    conv = ref_csnet.gOctaveConv(
        cin, cout, (k, k),
        alpha_in=[c / cin for c in in_split],
        alpha_out=[c / cout for c in out_split],
        stride=stride, padding=pad, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
    want = conv([torch.from_numpy(x) for x in xs])
    got = goct_conv(
        [nhwc(x) for x in xs], jnp.asarray(w.transpose(2, 3, 1, 0)), None,
        in_split=in_split, out_split=out_split, stride=stride, padding=pad,
    )
    for j in range(len(out_split)):
        np.testing.assert_allclose(nchw(got[j]), want[j].detach().numpy(),
                                   atol=2e-4)
