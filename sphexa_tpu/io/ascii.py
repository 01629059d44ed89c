"""Plain-text column writer (reference: main/src/io/ifile_io_ascii.cpp)."""

from __future__ import annotations

import numpy as np


class AsciiWriter:
    def __init__(self, path: str):
        self.path = path

    def write_step(self, state, cfg, box, fields=None, turb_state=None):
        ps = state.p
        alive = np.asarray(ps.alive)
        cols = {n: np.asarray(getattr(ps, n))[alive]
                for n in ("x", "y", "z", "vx", "vy", "vz", "h", "temp", "m")}
        cols.update({k: np.asarray(v)[alive] for k, v in (fields or {}).items()})
        names = list(cols)
        data = np.column_stack([cols[n] for n in names])
        with open(self.path, "a") as f:
            f.write("# step iteration=%d time=%.9g\n# %s\n"
                    % (int(state.iteration), float(state.ttot), " ".join(names)))
            np.savetxt(f, data, fmt="%.9g")

    def close(self):
        pass
