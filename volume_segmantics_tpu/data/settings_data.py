"""YAML/dict/None -> SimpleNamespace settings loading.

Parity with reference volume_segmantics/data/settings_data.py:10-27 (exits
with status 1 on a missing settings file).
"""

import logging
import sys
from pathlib import Path
from types import SimpleNamespace
from typing import Union

import yaml


def get_settings_data(data: Union[Path, dict, None]) -> SimpleNamespace:
    """Given a path to a YAML file or a dictionary, return a SimpleNamespace
    of settings. None returns an empty namespace."""
    if data is None:
        return SimpleNamespace()
    if isinstance(data, Path):
        logging.info(f"Loading settings from {data}")
        if data.exists():
            with open(data, "r") as stream:
                settings_dict = yaml.safe_load(stream)
            return SimpleNamespace(**settings_dict)
        logging.error("Couldn't find settings file... Exiting!")
        sys.exit(1)
    if isinstance(data, dict):
        return SimpleNamespace(**data)
