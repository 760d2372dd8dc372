"""torch.fx -> JAX converter vs torch oracle (CNN op set).

Mirrors the reference's converter round-trip tests
(tools/script/testMNNFromTorch.py: random inputs, run both, diff)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from mnn_tpu.convert.torch_fx import convert_torch_module  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_torch():
    torch.manual_seed(0)


def _check(mod, shape, rtol=2e-4, atol=2e-4, seed=0):
    torch.manual_seed(seed)
    mod = mod.eval()
    x = torch.randn(*shape)
    with torch.no_grad():
        want = mod(x).numpy()
    fn, params = convert_torch_module(mod)
    got = np.asarray(jax.jit(fn)(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


class InvertedResidual(nn.Module):
    """MobileNetV2-style block: expand -> depthwise -> project + residual."""

    def __init__(self, c, expand=4):
        super().__init__()
        h = c * expand
        self.conv = nn.Sequential(
            nn.Conv2d(c, h, 1, bias=False), nn.BatchNorm2d(h), nn.ReLU6(),
            nn.Conv2d(h, h, 3, padding=1, groups=h, bias=False),
            nn.BatchNorm2d(h), nn.ReLU6(),
            nn.Conv2d(h, c, 1, bias=False), nn.BatchNorm2d(c),
        )

    def forward(self, x):
        return x + self.conv(x)


class ResBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.c1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.b1 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.b2 = nn.BatchNorm2d(cout)
        self.down = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                          nn.BatchNorm2d(cout))
            if stride != 1 or cin != cout else nn.Identity()
        )

    def forward(self, x):
        y = torch.relu(self.b1(self.c1(x)))
        y = self.b2(self.c2(y))
        return torch.relu(y + self.down(x))


class SmallCNN(nn.Module):
    """MobileNet/ResNet-flavored classifier exercising the full op table."""

    def __init__(self, classes=10):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 16, 3, 2, 1, bias=False), nn.BatchNorm2d(16),
            nn.Hardswish(),
        )
        self.block1 = InvertedResidual(16)
        self.block2 = ResBlock(16, 32, stride=2)
        self.pool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(32, classes)

    def forward(self, x):
        x = self.stem(x)
        x = self.block1(x)
        x = self.block2(x)
        x = self.pool(x)
        x = torch.flatten(x, 1)
        return self.fc(x)


class TestTorchFxConvert:
    def test_conv_bn_relu(self):
        _check(nn.Sequential(
            nn.Conv2d(3, 8, 3, padding=1), nn.BatchNorm2d(8), nn.ReLU(),
        ), (2, 3, 16, 16))

    def test_depthwise_conv(self):
        _check(nn.Conv2d(8, 8, 3, padding=1, groups=8), (1, 8, 12, 12))

    def test_strided_dilated(self):
        _check(nn.Conv2d(4, 6, 3, stride=2, padding=2, dilation=2),
               (1, 4, 17, 17))

    def test_pools(self):
        _check(nn.MaxPool2d(2), (1, 4, 8, 8))
        _check(nn.MaxPool2d(3, stride=2, padding=1), (1, 4, 9, 9))
        _check(nn.AvgPool2d(2), (1, 4, 8, 8))
        _check(nn.AdaptiveAvgPool2d(1), (1, 4, 7, 7))

    def test_inverted_residual(self):
        _check(InvertedResidual(8), (1, 8, 10, 10), rtol=1e-3, atol=1e-4)

    def test_resblock(self):
        _check(ResBlock(8, 16, 2), (1, 8, 12, 12), rtol=1e-3, atol=1e-4)

    def test_full_cnn(self):
        _check(SmallCNN(), (2, 3, 32, 32), rtol=2e-3, atol=1e-3)

    def test_linear_mlp(self):
        _check(nn.Sequential(
            nn.Linear(12, 24), nn.GELU(), nn.LayerNorm(24), nn.Linear(24, 5),
        ), (3, 12), rtol=1e-3, atol=1e-4)

    def test_unsupported_module_message(self):
        class Odd(nn.Module):
            def __init__(self):
                super().__init__()
                self.op = nn.Fold(output_size=(4, 4), kernel_size=(2, 2))

            def forward(self, x):
                return self.op(x)

        fn, params = convert_torch_module(Odd())
        with pytest.raises(NotImplementedError, match="Fold"):
            fn(params, jnp.ones((1, 12, 9)))


class TestVisionModels:
    @pytest.mark.parametrize("name", ["mobilenet_v2", "squeezenet_v1.0"])
    def test_matches_torch(self, name):
        from mnn_tpu.models.vision import VISION_MODELS
        torch.manual_seed(0)
        mod = VISION_MODELS[name](num_classes=16).eval()
        x = torch.randn(1, 3, 64, 64)
        with torch.no_grad():
            want = mod(x).numpy()
        fn, params = convert_torch_module(mod)
        got = np.asarray(fn(params, jnp.asarray(x.numpy())))
        rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
        assert rel < 5e-3, rel
