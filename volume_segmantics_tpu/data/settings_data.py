"""Settings resolution: YAML file, plain dict, or nothing -> namespace.

The reference drives both workflows from two user-edited YAML files turned
into untyped namespaces (reference volume_segmantics/data/settings_data.py:
10-27). This framework keeps that contract — including terminating with
exit status 1 when a settings file is missing — so the shipped
``volseg-settings`` files and the SuRVoS2-style dict API work unchanged.
"""

import logging
import sys
from pathlib import Path
from types import SimpleNamespace
from typing import Union

import yaml


def _load_yaml_settings(path: Path) -> SimpleNamespace:
    logging.info(f"Loading settings from {path}")
    if not path.exists():
        logging.error("Couldn't find settings file... Exiting!")
        sys.exit(1)
    return SimpleNamespace(**yaml.safe_load(path.read_text()))


def get_settings_data(
    data: Union[Path, str, dict, None]
) -> SimpleNamespace:
    """Resolve `data` to a settings namespace.

    Accepts a YAML file path (Path or str), an already-assembled dict (the
    library-API route), or None (empty settings)."""
    if isinstance(data, (Path, str)):
        return _load_yaml_settings(Path(data))
    if isinstance(data, dict):
        return SimpleNamespace(**data)
    return SimpleNamespace()
