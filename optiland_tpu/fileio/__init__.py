"""File I/O: Zemax, CODE V, and native JSON formats
(reference: optiland/fileio/__init__.py:11-52)."""

from optiland_tpu.fileio.optiland_handler import (
    load_optiland_file,
    optic_from_dict,
    optic_to_dict,
    save_optiland_file,
)
from optiland_tpu.fileio.codev import load_codev_file, save_codev_file
from optiland_tpu.fileio.zemax import load_zemax_file, save_zemax_file

__all__ = [
    "load_codev_file",
    "save_codev_file",
    "load_optiland_file",
    "load_zemax_file",
    "optic_from_dict",
    "optic_to_dict",
    "save_optiland_file",
    "save_zemax_file",
]
