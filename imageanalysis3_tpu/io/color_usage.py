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


def load_encoding_scheme(master_folder: str,
                         encoding_filename: str = "Encoding_Scheme",
                         fmt: str = "csv"):
    """Combinatorial encoding scheme: hyb folder -> encoding matrix rows.

    Behavior target: get_img_info.py:526-631 (Load_Encoding_Scheme): a CSV
    whose rows are hyb-folder names with per-channel encoded region ids
    ('' -> -1), plus num_hyb / num_reg / num_color header rows.  Returns
    (scheme dict folder -> list[int], info dict).
    """
    path = os.path.join(master_folder, f"{encoding_filename}.{fmt}")
    delim = "\t" if fmt in ("tsv", "txt") else ","
    scheme: Dict[str, List[int]] = {}
    info: Dict[str, int] = {}
    with open(path, "r") as fh:
        reader = csv.reader(fh, delimiter=delim)
        next(reader)                      # header
        for row in reader:
            if not row:
                continue
            key = row[0]
            vals = [(-1 if v == "" else v) for v in row[1:]]
            if key in ("num_hyb", "num_reg", "num_color", "num_group"):
                info[key] = int(vals[0])
            else:
                scheme[key] = [int(v) for v in vals]
    return scheme, info


def load_region_positions(analysis_folder: str,
                          filename: str = "Region_Positions",
                          fmt: str = "csv"):
    """Region id -> genomic position table (reference get_img_info.py:
    169-233 Load_Region_Positions): columns region, chr, start, end."""
    path = os.path.join(analysis_folder, f"{filename}.{fmt}")
    delim = "\t" if fmt in ("tsv", "txt") else ","
    out: Dict[int, Dict[str, object]] = {}
    with open(path, "r") as fh:
        reader = csv.reader(fh, delimiter=delim)
        header = [h.strip().lower() for h in next(reader)]
        for row in reader:
            if not row or not row[0].strip():
                continue
            rec = {h: v for h, v in zip(header, row)}
            rid = int(rec.get("region", rec.get(header[0])))
            entry: Dict[str, object] = {}
            for k in ("chr", "chromosome"):
                if k in rec:
                    entry["chr"] = rec[k]
            for k in ("start", "end", "midpoint"):
                if k in rec and rec[k] != "":
                    entry[k] = float(rec[k])
            out[rid] = entry
    return out


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
