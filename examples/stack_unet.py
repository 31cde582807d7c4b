"""Parallel-branch (stacked) UNet (reference: examples/stack_unet.py):
MinkowskiStackCat runs branches on the same input and concatenates.

Run: python examples/stack_unet.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

if "--cpu" in _sys.argv:  # the axon TPU plugin ignores JAX_PLATFORMS
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from flax import nnx

import minkowskiengine_tpu as ME
from common import data_loader


class StackUNet(ME.MinkowskiNetwork):
    def __init__(self, in_nchannel, out_nchannel, D, rngs=None):
        super().__init__(D)
        rngs = rngs or nnx.Rngs(0)
        ch = [in_nchannel, 16, 32]

        class Branch(ME.MinkowskiNetwork):
            """conv-down → convT-up branch landing back on input coords."""

            def __init__(self, rngs):
                super().__init__(D)
                self.down = ME.MinkowskiConvolution(
                    ch[1], ch[2], kernel_size=2, stride=2, dimension=D, rngs=rngs
                )
                self.up = ME.MinkowskiConvolutionTranspose(
                    ch[2], ch[1], kernel_size=2, stride=2, dimension=D, rngs=rngs
                )

            def __call__(self, x):
                return self.up(self.down(x))

        class Identity(ME.MinkowskiNetwork):
            def __init__(self):
                super().__init__(D)

            def __call__(self, x):
                return x

        self.inc = ME.MinkowskiConvolution(
            ch[0], ch[1], kernel_size=3, dimension=D, rngs=rngs
        )
        self.stack = ME.MinkowskiStackCat(Identity(), Branch(rngs))
        self.out = ME.MinkowskiConvolution(
            2 * ch[1], out_nchannel, kernel_size=1, bias=True, dimension=D,
            rngs=rngs,
        )

    def __call__(self, x):
        return self.out(self.stack(self.inc(x)))


def main():
    coords, feats, _ = data_loader(nchannel=3, batch_size=2)
    x = ME.SparseTensor(feats, coords)
    net = StackUNet(3, 5, D=2)
    y = net(x)
    print(f"stacked UNet: {x.shape} → {y.shape} at stride {y.tensor_stride}")
    assert y.shape[1] == 5


if __name__ == "__main__":
    main()
