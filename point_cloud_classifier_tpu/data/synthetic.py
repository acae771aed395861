"""Synthetic Geant4-style shower generator for tests and verification.

The reference repo ships no data and no tests; this module generates tiny
HDF5 files with the exact schema the ingestion layer expects (see
``hdf5.load_shower_file`` and reference `utils/data.py:48-72`):

- ``metadata/subdetector_names``: byte-string lookup
- ``steps``: energy / event_id / position[N,3] / time / mcparticle_id /
  subdetector (index into lookup)
- ``particles``: id / parent_id / event_id  (MC-truth lineage tree)

Events are statistically separable by class so end-to-end training can reach
well-above-chance accuracy on tiny datasets — and the signal survives the
per-event normalizations of every pipeline:

- tabular: "protons" deposit a larger energy fraction in HCal, showers
  differ in spread and multiplicity
- point-cloud / graph: the S2PPC pipeline normalizes energy to per-event
  fractions, min-maxes time per event and standardizes positions per event
  (reference `utils/data.py:510-535`), so class signal must live in
  distribution *shape*: protons have spiky energy spectra (few dominant
  hits; gamma k=0.6), piM near-uniform sharing (k=3.5); proton hit times
  ~uniform, piM heavy-tailed exponential; proton showers isotropic, piM
  elongated along z.

Lineage trees deliberately include particles that appear in the ``particles``
table but leave **no steps** — this exercises the ancestor-BFS path of the
graph edge builder (reference `utils/data.py:932-973` searches through
unrecorded intermediate particles to the nearest recorded ancestor).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import h5py
import numpy as np

SUBDETECTOR_NAMES = [
    b"HCalBarrel",
    b"HCalEndcap",
    b"ECalBarrel",
    b"ECalEndcap",
    b"TrackerBarrel",  # maps to "Other" and is dropped by the tabular pipeline
]


def _make_event(rng: np.random.Generator, particle: str) -> Tuple[Dict, Dict]:
    """One event: a small particle tree plus its steps."""
    is_proton = particle == "proton"

    # lineage: pid 0 is the incident particle (parent -1); a chain of
    # secondaries, some of which never produce steps ("unrecorded").
    # hadronic piM showers fragment more: deeper/wider MC-truth trees —
    # class signal that lives in the GRAPH STRUCTURE itself (node count,
    # connectivity), surviving all per-graph feature normalizations
    n_secondaries = int(rng.integers(2, 5)) if is_proton else int(rng.integers(5, 9))
    pids = [0] + list(range(1, n_secondaries + 1))
    parents = [-1]
    for pid in pids[1:]:
        # parent is an earlier particle (often the unrecorded ones, to force
        # the BFS through missing ancestors)
        parents.append(int(rng.integers(0, pid)))

    # choose which secondaries actually leave steps (pid 0 always does)
    recorded = {0}
    for pid in pids[1:]:
        if rng.random() > 0.3:
            recorded.add(pid)
    # ensure at least one recorded secondary so graphs are non-trivial
    if len(recorded) == 1 and n_secondaries >= 1:
        recorded.add(pids[1])

    hcal_frac = 0.75 if is_proton else 0.35
    spread = 12.0 if is_proton else 7.0
    # piM showers are elongated along z; protons isotropic — survives the
    # per-axis per-event standardization as joint-shape signal
    axis_scale = np.array([1.0, 1.0, 1.0]) if is_proton else np.array([0.8, 0.8, 1.6])
    # energy sharing: proton spiky (few dominant hits), piM near-uniform —
    # survives the energy→per-event-fraction normalization
    energy_shape = 1.0 if is_proton else 2.2
    center = rng.normal(0.0, 3.0, size=3) + (np.array([0, 0, 40.0]))

    step_rows = {k: [] for k in ["energy", "time", "pos", "pid", "subdet"]}
    t_base = 0.05
    for pid in sorted(recorded):
        n_steps = int(rng.integers(2, 7)) if pid == 0 else int(rng.integers(1, 5))
        for s in range(n_steps):
            step_rows["pid"].append(pid)
            # time *shape*: proton ~uniform, piM heavy-tailed — survives the
            # per-event min-max normalization
            if is_proton:
                dt = rng.uniform(0.0, 3.0)
            else:
                dt = rng.exponential(1.2)
            step_rows["time"].append(t_base + dt + 0.2 * s + 0.1 * pid)
            step_rows["energy"].append(float(rng.gamma(energy_shape, 0.05) + 0.005))
            step_rows["pos"].append(center + rng.normal(0.0, spread, size=3) * axis_scale)
            in_hcal = rng.random() < hcal_frac
            if rng.random() < 0.05:
                step_rows["subdet"].append(4)  # TrackerBarrel → Other
            elif in_hcal:
                step_rows["subdet"].append(int(rng.integers(0, 2)))
            else:
                step_rows["subdet"].append(int(rng.integers(2, 4)))

    steps = {
        "energy": np.asarray(step_rows["energy"], dtype=np.float32),
        "time": np.asarray(step_rows["time"], dtype=np.float32),
        "position": np.stack(step_rows["pos"]).astype(np.float32),
        "mcparticle_id": np.asarray(step_rows["pid"], dtype=np.int64),
        "subdetector": np.asarray(step_rows["subdet"], dtype=np.int64),
    }
    particles_tbl = {
        "id": np.asarray(pids, dtype=np.int64),
        "parent_id": np.asarray(parents, dtype=np.int64),
    }
    return steps, particles_tbl


def write_shower_file(
    path: str, particle: str, n_events: int, seed: int
) -> None:
    rng = np.random.default_rng(seed)
    all_steps: List[Dict] = []
    all_particles: List[Dict] = []
    step_event_ids: List[np.ndarray] = []
    particle_event_ids: List[np.ndarray] = []

    for event in range(n_events):
        steps, particles_tbl = _make_event(rng, particle)
        all_steps.append(steps)
        all_particles.append(particles_tbl)
        step_event_ids.append(np.full(len(steps["energy"]), event, dtype=np.int64))
        particle_event_ids.append(np.full(len(particles_tbl["id"]), event, dtype=np.int64))

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        meta = f.create_group("metadata")
        meta.create_dataset("subdetector_names", data=np.array(SUBDETECTOR_NAMES))
        sg = f.create_group("steps")
        sg.create_dataset("energy", data=np.concatenate([s["energy"] for s in all_steps]))
        sg.create_dataset("time", data=np.concatenate([s["time"] for s in all_steps]))
        sg.create_dataset("position", data=np.concatenate([s["position"] for s in all_steps]))
        sg.create_dataset("mcparticle_id", data=np.concatenate([s["mcparticle_id"] for s in all_steps]))
        sg.create_dataset("subdetector", data=np.concatenate([s["subdetector"] for s in all_steps]))
        sg.create_dataset("event_id", data=np.concatenate(step_event_ids))
        pg = f.create_group("particles")
        pg.create_dataset("id", data=np.concatenate([p["id"] for p in all_particles]))
        pg.create_dataset("parent_id", data=np.concatenate([p["parent_id"] for p in all_particles]))
        pg.create_dataset("event_id", data=np.concatenate(particle_event_ids))


def write_synthetic_dataset(
    data_dir: str,
    n_events_per_file: int = 40,
    n_files_per_particle: int = 1,
    seed: int = 0,
    particles: Tuple[str, ...] = ("proton", "piM"),
) -> str:
    """Write a full tiny dataset tree; returns ``data_dir``.

    Filenames follow the ``{particle}_file{N}.h5`` convention so the part
    parser (reference `utils/data.py:590`) works.
    """
    os.makedirs(data_dir, exist_ok=True)
    for p_i, particle in enumerate(particles):
        for n in range(n_files_per_particle):
            write_shower_file(
                os.path.join(data_dir, f"{particle}_file{n}.h5"),
                particle,
                n_events_per_file,
                seed=seed + 1000 * p_i + n,
            )
    return data_dir
