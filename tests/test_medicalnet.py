"""MedicalNet ResNet-10 perceptual: converter parity vs a torch replica of
the Med3D trunk (reference percept_loss.py:29-126), loss semantics, wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusioniqt_tpu.metrics.medicalnet import (
    MedicalNetPerceptual,
    MedicalNetResNet10,
    load_medicalnet_state_dict,
)

torch = pytest.importorskip("torch")


def _torch_med3d_trunk():
    """Med3D ResNet-10 conv1..layer2 with type-B downsample, as the
    reference's percept_loss blocks use it (eval mode)."""
    nn_ = torch.nn

    class BasicBlock(nn_.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn_.Conv3d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn_.BatchNorm3d(cout)
            self.conv2 = nn_.Conv3d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn_.BatchNorm3d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn_.Sequential(
                    nn_.Conv3d(cin, cout, 1, stride, bias=False),
                    nn_.BatchNorm3d(cout),
                )

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + r)

    class Trunk(nn_.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn_.Conv3d(1, 64, 7, 2, 3, bias=False)
            self.bn1 = nn_.BatchNorm3d(64)
            self.maxpool = nn_.MaxPool3d(3, 2, 1)
            self.layer1 = nn_.Sequential(BasicBlock(64, 64, 1))
            self.layer2 = nn_.Sequential(BasicBlock(64, 128, 2))

        def forward(self, x):
            outs = [self.conv1(x)]
            outs.append(self.bn1(outs[-1]))
            outs.append(torch.relu(outs[-1]))
            outs.append(self.maxpool(outs[-1]))
            outs.append(self.layer1(outs[-1]))
            outs.append(self.layer2(outs[-1]))
            return outs

    torch.manual_seed(0)
    trunk = Trunk()
    # non-trivial BatchNorm running stats so the eval-affine fold is tested
    with torch.no_grad():
        trunk.train()
        for _ in range(3):
            trunk(torch.randn(2, 1, 32, 32, 32))
    return trunk.eval()


def test_converter_block_parity():
    trunk = _torch_med3d_trunk()
    sd = {f"module.{k}": v.detach().numpy()
          for k, v in trunk.state_dict().items()}
    # Med3D layer names inside Sequential: layer1.0.conv1 ...
    variables = load_medicalnet_state_dict(sd)

    x = np.random.default_rng(0).standard_normal(
        (1, 32, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        torch_outs = trunk(torch.tensor(x.transpose(0, 4, 1, 2, 3)))
    flax_outs = MedicalNetResNet10().apply(variables, jnp.asarray(x))

    assert len(flax_outs) == len(torch_outs) == 6
    for fo, to in zip(flax_outs, torch_outs):
        np.testing.assert_allclose(
            np.asarray(fo), to.numpy().transpose(0, 2, 3, 4, 1),
            rtol=2e-3, atol=2e-3,
        )


def test_perceptual_loss_semantics():
    model = MedicalNetPerceptual(resize=False, input_size=16)
    a = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16, 1))
    b = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 1))
    assert float(model(a, a)) < 1e-6
    assert float(model(a, b)) > 1e-3
    # differentiable wrt pred
    g = jax.grad(lambda p: model(p, b))(a)
    assert bool(jnp.any(g != 0))


def test_medlpips_config_wiring():
    from diffusioniqt_tpu.config import Config
    from diffusioniqt_tpu.diffusion.gaussian import imagen_from_config
    from diffusioniqt_tpu.models.unet3d import NullUnet

    cfg = Config()
    cfg.train.medlpips = True
    imagen = imagen_from_config(cfg, (NullUnet(), NullUnet()))
    assert imagen.lpips_fn is not None
