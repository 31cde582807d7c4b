"""MinkowskiNetwork abstract base (reference:
MinkowskiEngine/MinkowskiNetwork.py:1-57)."""

from __future__ import annotations

from abc import abstractmethod

from .module import MinkowskiModuleBase


class MinkowskiNetwork(MinkowskiModuleBase):
    """Base class for networks over sparse tensors in D dimensions."""

    def __init__(self, D: int):
        self.D = int(D)

    @abstractmethod
    def __call__(self, x):
        ...
