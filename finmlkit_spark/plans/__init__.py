from .api import (
    BinOp,
    Compose,
    ConstOp,
    Feature,
    FeatureKit,
    Input,
    Transform,
    UnaryOp,
    from_config,
    register_transform,
)

__all__ = [
    "BinOp",
    "Compose",
    "ConstOp",
    "Feature",
    "FeatureKit",
    "Input",
    "Transform",
    "UnaryOp",
    "from_config",
    "register_transform",
]
