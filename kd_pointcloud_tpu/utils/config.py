"""YAML config system.

Rebuild of cmd_args.py + utils/easydict.py: a YAML file maps to an
attribute-access config with the reference's postprocessing rules
(cmd_args.py:15-54): dataset-name validation, xavier-init default,
custom-lr schedule parsing, evaluate⇒resume assertion.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import yaml


class Config(dict):
    """dict with attribute access (utils/easydict.py semantics)."""

    def __init__(self, d: Dict[str, Any] = None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)


def postprocess(args: Config) -> Config:
    """Validation + defaults (cmd_args.py:15-54)."""
    from ..data.datasets import DATASETS

    args.allow_less_points = bool(args.get("allow_less_points", False))
    assert args.get("dataset") in DATASETS, f"unknown dataset {args.get('dataset')}"
    assert "data_root" in args, "config must set data_root"

    if not args.get("evaluate", False):
        # NOTE: the reference injects init='xavier'/gain defaults here
        # (cmd_args.py:25-28) but its entry scripts never call
        # init_weights_multi (main_utils.py:34-51 is dead code, SURVEY
        # §2.1-30) — actual reference behavior is torch-default init, which
        # is what nn/blocks.py reproduces. The keys are accepted but
        # deliberately NOT re-injected or consumed.
        if args.get("custom_lr"):
            args.lrs = [float(x) for x in args.lrs.split(",")][::-1]
            args.lr_switch_epochs = [int(x) for x in
                                     args.lr_switch_epochs.split(",")][::-1]
            assert len(args.lrs) == len(args.lr_switch_epochs)
            diffs = np.diff(args.lr_switch_epochs)
            assert np.all(diffs < 0)
            args.lr = args.lrs[-1]
    else:
        assert args.get("resume"), "evaluate=True requires resume"
    return args


def parse_args_from_yaml(yaml_path: str) -> Config:
    with open(yaml_path) as fd:
        return postprocess(Config(yaml.safe_load(fd)))
