"""Model zoo (reference: models/__init__.py exports only ENet; ICNet was
an empty stub there, models/icnet/icnet.py:1-7, and is fully implemented
here)."""

from .enet import ENet
from .icnet import ICNet

_REGISTRY = {"enet": ENet, "icnet": ICNet}


def get_model(name: str, num_classes: int, **kwargs):
    try:
        cls = _REGISTRY[name.lower()]
    except KeyError:
        raise NotImplementedError(f"Model {name!r} not supported") from None
    return cls(num_classes=num_classes, **kwargs)


__all__ = ["ENet", "ICNet", "get_model"]
