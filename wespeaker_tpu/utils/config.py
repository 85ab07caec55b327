"""YAML config + command-line override merging.

Behavioral spec: wespeaker/utils/utils.py:36-51 (parse_config_or_kwargs —
YAML file merged with CLI kwargs, kwargs win). Overrides use dotted paths
('dataset_args.num_frms=300') with YAML-parsed values, replacing the
reference's python-fire dependency with argparse-friendly strings.
"""

import copy
from typing import Any, Dict, List, Optional

import yaml


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def set_dotted(config: Dict[str, Any], key: str, value: Any):
    parts = key.split(".")
    node = config
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def parse_override(s: str):
    key, _, raw = s.partition("=")
    return key.strip(), yaml.safe_load(raw)


def parse_config_or_kwargs(config_file: str,
                           overrides: Optional[List[str]] = None,
                           **kwargs) -> Dict[str, Any]:
    """Load YAML; apply 'a.b=c' override strings, then python kwargs
    (kwargs win, like the reference)."""
    config = load_yaml(config_file)
    for ov in overrides or []:
        key, value = parse_override(ov)
        set_dotted(config, key, value)
    for key, value in kwargs.items():
        set_dotted(config, key, value)
    return config


def dump_yaml(config: Dict[str, Any], path: str):
    with open(path, "w") as f:
        yaml.safe_dump(copy.deepcopy(config), f, sort_keys=False)
