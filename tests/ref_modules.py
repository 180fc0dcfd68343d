"""Import helper: load reference PyTorch modules for parity oracles.

The reference repo (`/root/reference`) imports torchvision/pycocotools at
module top level; neither is installed here and neither is needed for the
modules we oracle against (GCN, geometric support encoder, decoder layer).
This shim registers minimal stub modules, puts the reference on sys.path,
and exposes lazy accessors. Used ONLY by tests — no reference code is
copied, it is imported read-only as a numerical oracle.
"""

from __future__ import annotations

import sys
import types

_REF = "/root/reference"


class _StubModule(types.ModuleType):
    """Module stub returning inert classes for any attribute."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return type(name, (), {"__init__": lambda self, *a, **k: None})


def _stub(name, **attrs):
    mod = _StubModule(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_reference():
    """Idempotently stub heavy deps and add /root/reference to sys.path."""
    if _REF in sys.path:
        return
    import torch.nn as nn

    tv = _stub("torchvision")
    tv.__version__ = "0.15.0"
    _stub("torchvision.ops")
    _stub("torchvision.ops.misc", FrozenBatchNorm2d=nn.Identity)
    _stub("torchvision.ops.boxes", batched_nms=lambda *a, **k: None)
    _stub("torchvision.models")
    _stub("torchvision.models._utils", IntermediateLayerGetter=nn.Identity)
    _stub("torchvision.transforms")
    _stub("pycocotools")
    _stub("pycocotools.coco", COCO=object)
    class Mlp(nn.Module):
        """Faithful minimal stand-in for `timm.layers.Mlp` (fc1 -> act ->
        drop -> fc2 -> drop), enough to run the reference BiX blocks."""

        def __init__(self, in_features, hidden_features=None,
                     out_features=None, act_layer=nn.GELU, drop=0.0, **kw):
            super().__init__()
            hidden = hidden_features or in_features
            out = out_features or in_features
            self.fc1 = nn.Linear(in_features, hidden)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden, out)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    _stub("timm")
    _stub("timm.layers", DropPath=nn.Identity, Mlp=Mlp)
    sys.path.insert(0, _REF)


def graph_utils():
    install_reference()
    from models import graph_utils as m  # noqa: PLC0415

    return m


def geometric_support_encoder():
    install_reference()
    from models import geometric_support_encoder as m  # noqa: PLC0415

    return m


def dtv2():
    install_reference()
    from models import deformable_transformer_v2 as m  # noqa: PLC0415

    return m


def positional_encoding():
    install_reference()
    from models import positional_encoding as m  # noqa: PLC0415

    return m
