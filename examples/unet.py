"""A hand-rolled 2-level UNet with skip connections via ME.cat
(reference: examples/unet.py), trained briefly on a synthetic
2-D segmentation task.

Run: python examples/unet.py [--cpu]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse

import numpy as np


def main(steps=5):
    import jax.numpy as jnp
    import optax
    from flax import nnx

    import minkowskiengine_tpu as ME
    import minkowskiengine_tpu.nn.functional as MF
    from common import data_loader

    D = 2

    class UNet(ME.MinkowskiNetwork):
        """Mirrors reference examples/unet.py:33-106 (blocks + ME.cat
        skips), built from tpu-native modules."""

        def __init__(self, in_nchannel, out_nchannel, D, rngs):
            super().__init__(D)
            C = ME.MinkowskiConvolution
            CT = ME.MinkowskiConvolutionTranspose
            BN = ME.MinkowskiBatchNorm
            self.conv1 = C(in_nchannel, 8, kernel_size=3, dimension=D, rngs=rngs)
            self.bn1 = BN(8)
            self.conv2 = C(8, 16, kernel_size=3, stride=2, dimension=D, rngs=rngs)
            self.bn2 = BN(16)
            self.conv3 = C(16, 32, kernel_size=3, stride=2, dimension=D, rngs=rngs)
            self.bn3 = BN(32)
            self.conv3_tr = CT(32, 16, kernel_size=3, stride=2, dimension=D, rngs=rngs)
            self.bn3_tr = BN(16)
            self.conv2_tr = CT(32, 16, kernel_size=3, stride=2, dimension=D, rngs=rngs)
            self.bn2_tr = BN(16)
            self.conv1_tr = C(24, out_nchannel, kernel_size=1, dimension=D, rngs=rngs)

        def __call__(self, x):
            out_s1 = self.bn1(self.conv1(x))
            out = MF.relu(out_s1)
            out_s2 = self.bn2(self.conv2(out))
            out = MF.relu(out_s2)
            out_s4 = self.bn3(self.conv3(out))
            out = MF.relu(out_s4)
            out = MF.relu(self.bn3_tr(self.conv3_tr(out)))
            out = ME.cat(out, out_s2)
            out = MF.relu(self.bn2_tr(self.conv2_tr(out)))
            out = ME.cat(out, out_s1)
            return self.conv1_tr(out)

    net = UNet(3, 5, D=D, rngs=nnx.Rngs(0))
    print(net)

    coords, feats, _ = data_loader(
        nchannel=3, is_classification=False, batch_size=4, dimension=D
    )
    x = ME.SparseTensor(feats, coords)
    out = net(x)  # warm geometry + show shapes
    print(f"input: {x.size} sites -> output: {out.size} sites x "
          f"{out.padded_features.shape[1]} classes")

    # learnable synthetic target: quadrant of the coordinate
    cpu_coords = np.asarray(out.C)
    labels = ((cpu_coords[:, 1] > 0) + 2 * (cpu_coords[:, 2] > 0)).astype(
        np.int32
    )
    labels_pad = np.zeros(out.capacity, np.int32)
    labels_pad[: out.size] = labels
    y = jnp.asarray(labels_pad)
    optimizer = nnx.Optimizer(net, optax.adam(1e-2), wrt=nnx.Param)

    @nnx.jit
    def step(model, opt, f):
        def loss_fn(m):
            xt = ME.SparseTensor(
                f,
                coordinate_map_key=x.coordinate_map_key,
                coordinate_manager=x.coordinate_manager,
            )
            o = m(xt)
            mask = o.valid_row_mask.astype(jnp.float32)
            losses = optax.softmax_cross_entropy_with_integer_labels(
                o.padded_features, y
            )
            return jnp.sum(losses * mask) / jnp.sum(mask)

        loss, grads = nnx.value_and_grad(loss_fn)(model)
        opt.update(model, grads)
        return loss

    for i in range(steps):
        loss = step(net, optimizer, x.padded_features)
        print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--steps", type=int, default=5)
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    main(args.steps)
