"""Experiment metadata: Color_Usage tables and hybridization folder layout.

Behavior targets (reference ImageAnalysis3):
  * Color_Usage CSV parsing   get_img_info.py:96-167 (Load_Color_Usage)
  * hyb folder scanning       io_tools/data.py:20-55 / get_img_info.py:12-33
    (H*-prefixed folders containing per-FOV .dax files)
  * channel roles             get_img_info.py:496-524 (find_bead_channel,
    find_dapi_channel)

A Color_Usage table maps hyb-folder name -> per-channel content (region ids
like 'u101', 'c5', gene names, 'beads', 'DAPI', or empty), with the header
row naming the laser channels.
"""

from __future__ import annotations

import csv
import glob
import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class ColorUsage:
    """Parsed Color_Usage: channels + per-hyb-folder channel contents."""

    channels: List[str]
    usage: Dict[str, List[str]]          # folder -> contents per channel
    has_dapi: bool = False

    def folders(self) -> List[str]:
        return list(self.usage.keys())

    def bead_channel_index(self, bead_name: str = "beads") -> Optional[int]:
        """Index of the channel carrying fiducial beads (constant across
        hybs; reference get_img_info.py:496-524)."""
        for contents in self.usage.values():
            for i, c in enumerate(contents):
                if c.lower() == bead_name.lower():
                    return i
        return None

    def dapi_channel_index(self) -> Optional[int]:
        for contents in self.usage.values():
            for i, c in enumerate(contents):
                if c.lower() == "dapi":
                    return i
        return None

    def regions_of(self, folder: str) -> Dict[int, str]:
        """channel index -> region/content id for data channels (excluding
        beads/DAPI/empty)."""
        out = {}
        for i, c in enumerate(self.usage.get(folder, [])):
            if c and c.lower() not in ("beads", "dapi", "null", "nan"):
                out[i] = c
        return out


def load_color_usage(path_or_folder: str,
                     filename: str = "Color_Usage",
                     fmt: str = "csv") -> ColorUsage:
    """Load a Color_Usage table (reference get_img_info.py:96-167)."""
    if os.path.isdir(path_or_folder):
        path = os.path.join(path_or_folder, f"{filename}.{fmt}")
    else:
        path = path_or_folder
    delim = "\t" if path.endswith((".tsv", ".txt")) else ","
    usage: Dict[str, List[str]] = {}
    with open(path, "r") as fh:
        reader = csv.reader(fh, delimiter=delim)
        header = next(reader)
        for row in reader:
            while row and row[-1] == "":
                row = row[:-1]
            if len(row) > 1:
                usage[row[0]] = row[1:]
    channels = [c for c in header[1:]]
    has_dapi = any("dapi" in (c.lower() for c in v) for v in usage.values())
    return ColorUsage(channels=channels, usage=usage, has_dapi=has_dapi)


_HYB_RE = re.compile(r"^H(\d+)")


def find_hyb_folders(master_folder: str,
                     fov_pattern: str = "*.dax") -> Tuple[List[str], List[str]]:
    """(sorted hyb folders containing .dax files, sorted fov basenames).

    Reference behavior: folders starting with 'H' holding .dax movies;
    fov filenames shared across folders (io_tools/data.py:20-55).
    """
    folders = []
    for d in sorted(os.listdir(master_folder)):
        full = os.path.join(master_folder, d)
        if os.path.isdir(full) and _HYB_RE.match(d) \
                and glob.glob(os.path.join(full, fov_pattern)):
            folders.append(full)

    def hyb_key(f):
        m = _HYB_RE.match(os.path.basename(f))
        return (int(m.group(1)), os.path.basename(f))

    folders.sort(key=hyb_key)
    fovs: List[str] = []
    if folders:
        fovs = sorted(os.path.basename(p)
                      for p in glob.glob(os.path.join(folders[0],
                                                      fov_pattern)))
    return folders, fovs
