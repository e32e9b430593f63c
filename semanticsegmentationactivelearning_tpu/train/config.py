"""Parameter-file handling (reference: conf/*.json schema, C22; loaded
by the CLIs at train.py:490-494 and dumped for provenance at 207-211).

The JSON schema is kept drop-in identical to the reference's conf files
(conf/default_params.json:1-59)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict

DEFAULTS: Dict[str, Any] = {
    "batch_size": 8,
    "epochs": 100,
    "hyperparams": {
        "dropout_rates": [0.01, 0.1, 0.1, 0.1, 0.1],
        "learning_rate": 5e-4,
        "learning_rate_decay": 0.0,
        "optimizer": {"type": "Adam",
                      "kwargs": {"beta1": 0.9, "beta2": 0.99}},
        "weight_reg": {"L2": 2e-4, "L1": 0.0, "glorot_scaling": False},
        "softmax": {"label_smoothing": 0.0, "loginverse_scaling": 0.0,
                    "multiscale": False},
    },
    "network": {"model": "ENet", "input": {"height": 512, "width": 1024}},
    # colorized input/label/prediction PNG dumps per epoch (reference
    # wrote these as TB image summaries, train.py:178-206); cadence 0
    # disables, AL pseudo-label snapshots use pseudo_cadence
    # (active_learning.py:367-388 wrote them every 100 epochs)
    "image_summaries": {"cadence": 1, "count": 2, "pseudo_cadence": 100},
    # step-resolution scalar cadence (reference wrote loss/cost/LR
    # every iteration, train.py:167-176); 0 disables
    "summary_interval": 1,
    # sequential train steps scanned into ONE dispatch (amortizes the
    # fixed per-dispatch overhead, ~27ms through the TPU relay);
    # 1 = per-step dispatch, single-host only
    "train_group": 1,
}


def _merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_params(path: str) -> Dict[str, Any]:
    """Load a conf JSON, filling any missing keys from the defaults."""
    with open(path, "r") as fp:
        params = json.load(fp)
    return _merge(DEFAULTS, params)


def dump_params(params: Dict[str, Any], log_dir: str) -> None:
    """Write the resolved parameters to ``{log_dir}/config.json``
    (reference: train.py:207-211)."""
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "config.json"), "w") as fp:
        json.dump(params, fp, indent=4, sort_keys=True)
