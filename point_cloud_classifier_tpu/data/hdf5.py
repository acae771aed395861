"""HDF5 shower-file ingestion.

The raw input format (reference `utils/data.py:48-72`) is one HDF5 file per
(particle type, part number) with three groups:

- ``metadata/subdetector_names`` — byte-string lookup table
- ``steps`` — per energy-deposit arrays: ``energy``, ``event_id``,
  ``position`` [N,3], ``time``, ``mcparticle_id``, ``subdetector`` (int index
  into the lookup table)
- ``particles`` — MC-truth tree: ``id``, ``parent_id``, ``event_id``

File discovery (reference `utils/data.py:37-45`): recursive walk of
``data_dir`` matching ``*.h5``/``*.hdf5`` whose basename contains the
particle name.  Part numbers are parsed from the ``..._file{N}.h5`` suffix.
"""

from __future__ import annotations

import os
from typing import Dict, List

import h5py
import numpy as np


def find_shower_files(data_dir: str, particle: str) -> List[str]:
    """All .h5/.hdf5 files under ``data_dir`` whose name contains ``particle``."""
    matches = []
    for root, _, files in os.walk(data_dir):
        for fname in files:
            if fname.endswith((".h5", ".hdf5")) and particle in fname:
                matches.append(os.path.join(root, fname))
    print(f"Found {len(matches)} files for {particle}")
    return matches


def parse_part_number(filepath: str) -> int:
    """Part index from a ``..._file{N}.h5`` basename (reference `utils/data.py:590`)."""
    tail = os.path.basename(filepath).split("_")[-1]
    return int(tail.replace("file", "").replace(".h5", "").replace(".hdf5", ""))


def load_shower_file(filepath: str) -> Dict[str, np.ndarray]:
    """Read one shower file into host numpy arrays.

    Returns the same key set the reference loader produces
    (`utils/data.py:60-70`), with ``subdetector`` already decoded through the
    metadata name table.
    """
    with h5py.File(filepath, "r") as f:
        names = f["metadata"]["subdetector_names"][:]
        steps = f["steps"]
        particles = f["particles"]
        data = {
            "energy": steps["energy"][:],
            "event_id": steps["event_id"][:],
            "position": steps["position"][:],
            "time": steps["time"][:],
            "mcparticle_id": steps["mcparticle_id"][:],
            "subdetector": names[steps["subdetector"][:]],
            "particle_id": particles["id"][:],
            "parent_id": particles["parent_id"][:],
            "particle_event_id": particles["event_id"][:],
        }
    return data


def decode_subdetectors(raw: np.ndarray) -> np.ndarray:
    """Byte-strings → unicode (reference decodes lazily per row, `utils/data.py:222-224`).

    Decoded over the UNIQUE vocabulary then gathered back (round-5
    review): the subdetector vocabulary is a handful of names, so the
    per-element Python decode ran millions of needless iterations per
    shower file.  `decoded[inv]` reproduces the per-element decode
    exactly."""
    uniq, inv = np.unique(np.asarray(raw), return_inverse=True)
    decoded = np.array(
        [s.decode("utf-8") if isinstance(s, bytes) else str(s) for s in uniq]
    )
    return decoded[inv]


def detector_category(subdetector_names: np.ndarray) -> np.ndarray:
    """Map decoded subdetector names to {HCal, ECal, Other}.

    Reference `utils/data.py:227-229`: HCal wins if the substring "HCal"
    appears anywhere, then ECal, else Other.  Categorized over the unique
    vocabulary (see :func:`decode_subdetectors`)."""
    uniq, inv = np.unique(np.asarray(subdetector_names), return_inverse=True)
    cat = np.array(
        [
            "HCal" if "HCal" in name else ("ECal" if "ECal" in name else "Other")
            for name in uniq
        ]
    )
    return cat[inv]
