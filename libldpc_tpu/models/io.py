"""File-format parsers for the reference's on-disk code formats.

Formats covered (all host-side, parsed once at startup — hot-path data then
lives as padded device tensors, see :mod:`libldpc_tpu.models.code`):

* **codefile** — one ``row col [val]`` pair per nonzero of H.  Two dialects
  share a superset grammar: the CPU stack skips *any* line containing ``:`` as
  a header while extracting ``puncture``/``shorten`` index lists
  (``src/core/ldpc.cpp:49-76``); the GPU stack requires
  ``nc:/mc:/nct:/mct:/nnz:`` counts up front (``gpu/ldpc/ldpc.cpp:32-83``).
  This parser accepts both: headers are recognised by ``:``, known count
  headers are validated against the parsed matrix when present.
* **generator file** — ``row col`` pairs of G with no header
  (``src/core/ldpc.cpp:103-106``, sample ``tests/code/g.txt``).
* **layerfile** — ``nl:`` + per-layer CN index lists for layered/serial
  decoding schedules (``gpu/ldpc/ldpc.cpp:111-138``).
* **simfile / mapfile** — GPU simulation config: constellation size, bits per
  symbol, labels, SNR list, stopping parameters; bit-to-symbol mapping
  (``gpu/sim/ldpcsim.cpp:48-138``).
* **results file** — whitespace table ``snr fer ber frames avg_iter
  [frame_time]`` rewritten incrementally (``src/sim/ldpcsim.cpp:128-134``).

Matrix dimensions are inferred from the maximum indices seen (+1), exactly
like ``sparse_csr::read_from_file`` (``src/core/sparse.h:92-153``).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np

try:  # fast native parser, optional
    from ..runtime import native as _native

    if not _native.available():  # pragma: no cover - toolchain-less envs
        _native = None
except Exception:  # pragma: no cover - fallback exercised when not built
    _native = None


@dataclasses.dataclass
class ParsedCode:
    """Raw result of parsing a codefile."""

    rows: np.ndarray  # int32 [nnz] check index per edge
    cols: np.ndarray  # int32 [nnz] variable index per edge
    nc: int
    mc: int
    puncture: np.ndarray  # int32, variable indices
    shorten: np.ndarray  # int32, variable indices


def _parse_header_line(line: str, puncture: list, shorten: list, counts: dict) -> None:
    token, _, rest = line.partition(":")
    token = token.strip().lower()
    values = rest.split()
    if "puncture" in token:
        puncture.extend(int(v) for v in values)
    elif "shorten" in token:
        shorten.extend(int(v) for v in values)
    else:
        key = token.split("[")[0].strip()
        if key in ("nc", "mc", "nct", "mct", "nnz") and values:
            try:
                counts[key] = int(values[0])
            except ValueError:
                pass


def parse_codefile(path: str) -> ParsedCode:
    """Parse a parity-check codefile (either dialect)."""
    puncture: list[int] = []
    shorten: list[int] = []
    counts: dict[str, int] = {}
    data_lines: list[str] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if ":" in line:
                _parse_header_line(line, puncture, shorten, counts)
            else:
                data_lines.append(line)

    if _native is not None:
        rows, cols = _native.parse_pairs(path)
    else:
        pairs = np.array(
            [ln.split()[:2] for ln in data_lines], dtype=np.int32
        ).reshape(-1, 2)
        rows, cols = pairs[:, 0].copy(), pairs[:, 1].copy()
    if rows.size == 0:
        raise ValueError(f"{path}: no matrix entries found")

    # dims inferred from max indices like sparse.h:136-143; the declared
    # nc:/mc: headers (GPU dialect) win if larger, since trailing all-zero
    # rows/columns are invisible to the pair list.
    mc = max(int(rows.max()) + 1, counts.get("mc", 0))
    nc = max(int(cols.max()) + 1, counts.get("nc", 0))
    if "nnz" in counts and counts["nnz"] != rows.size:
        raise ValueError(
            f"{path}: header declares nnz={counts['nnz']} but parsed {rows.size}"
        )
    return ParsedCode(
        rows=rows.astype(np.int32),
        cols=cols.astype(np.int32),
        nc=nc,
        mc=mc,
        puncture=np.asarray(sorted(set(puncture)), dtype=np.int32),
        shorten=np.asarray(sorted(set(shorten)), dtype=np.int32),
    )


def parse_genfile(path: str, nc: Optional[int] = None) -> np.ndarray:
    """Parse a generator-matrix file into a dense uint8 ``[kc, nc]`` array.

    Dimensions inferred from max indices (+1) like the H parser; ``nc`` may
    be passed to widen the matrix to the code's column count (trailing
    all-zero columns of G are invisible to the pair list).
    """
    if _native is not None:
        rows, cols = _native.parse_pairs(path)
    else:
        pairs = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line or ":" in line:
                    continue
                a = line.split()
                pairs.append((int(a[0]), int(a[1])))
        arr = np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
        rows, cols = arr[:, 0], arr[:, 1]
    kc = int(rows.max()) + 1
    n = int(cols.max()) + 1
    if nc is not None:
        n = max(n, nc)
    G = np.zeros((kc, n), dtype=np.uint8)
    G[rows, cols] ^= 1
    return G


def parse_layerfile(path: str) -> list[np.ndarray]:
    """Parse a decoding-layer file: ``nl: <N>`` then per-layer
    ``cn[i]: <count>`` followed by that many CN indices, one per line
    (``gpu/ldpc/ldpc.cpp:111-128``)."""
    with open(path) as f:
        tokens: list[str] = []
        for line in f:
            tokens.extend(line.replace(":", " : ").split())
    it = iter(tokens)
    layers: list[np.ndarray] = []

    def expect_count() -> int:
        # consume "<name> : <int>"
        next(it)  # name
        next(it)  # ':'
        return int(next(it))

    nl = expect_count()
    for _ in range(nl):
        lw = expect_count()
        layers.append(np.array([int(next(it)) for _ in range(lw)], dtype=np.int32))
    return layers


@dataclasses.dataclass
class SimFile:
    """GPU-dialect simulation config (``gpu/sim/ldpcsim.cpp:48-115``)."""

    name: str
    M: int
    bits: int
    labels: np.ndarray
    snrs: np.ndarray
    max_frames: int
    min_fec: int
    bp_iter: int
    early_term: bool


def parse_simfile(path: str) -> SimFile:
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]

    def value(i: int) -> str:
        return lines[i].partition(":")[2].strip()

    name = value(0)
    M = int(value(1))
    bits = int(value(2))
    labels = np.array([int(t) for t in value(3).replace(",", " ").split()], dtype=np.int32)
    if labels.size != M:
        raise ValueError(
            f"{path}: number of constellation labels ({labels.size}) != M ({M})"
        )
    snrs = np.array([float(t) for t in value(4).replace(",", " ").split()])
    return SimFile(
        name=name,
        M=M,
        bits=bits,
        labels=labels,
        snrs=snrs,
        max_frames=int(value(5)),
        min_fec=int(value(6)),
        bp_iter=int(value(7)),
        early_term=bool(int(value(8))),
    )


def parse_mapfile(path: str, bits: int, n_sym: int) -> np.ndarray:
    """Parse a bit-to-symbol mapping file: a single comma-separated line of
    ``bits * n_sym`` codeword-bit indices, row-major ``[bits, n_sym]``
    (``gpu/sim/ldpcsim.cpp:126-138``)."""
    with open(path) as f:
        text = f.read()
    vals = [int(t) for t in text.replace(",", " ").split()]
    if len(vals) < bits * n_sym:
        raise ValueError(
            f"{path}: expected {bits * n_sym} mapping entries, got {len(vals)}"
        )
    return np.array(vals[: bits * n_sym], dtype=np.int32).reshape(bits, n_sym)


def write_codefile(
    path: str,
    rows: np.ndarray,
    cols: np.ndarray,
    nc: int,
    mc: int,
    puncture: Optional[np.ndarray] = None,
    shorten: Optional[np.ndarray] = None,
    headered: bool = True,
) -> None:
    """Write a codefile in the reference's format.

    ``headered=True`` emits the GPU-dialect ``nc:/mc:/...`` counts plus
    ``puncture``/``shorten`` lines (which the CPU parser skips/extracts,
    making the file valid for both stacks, like the bundled
    ``tests/code/h.txt``); ``headered=False`` emits bare pairs.
    """
    puncture = np.asarray(puncture if puncture is not None else [], dtype=np.int64)
    shorten = np.asarray(shorten if shorten is not None else [], dtype=np.int64)
    with open(path, "w") as f:
        if headered:
            nct = nc - puncture.size - shorten.size
            mct = mc - puncture.size
            f.write(f"nc: {nc}\nmc: {mc}\nnct: {nct}\nmct: {mct}\n")
            f.write(f"nnz: {len(rows)}\n")
            f.write(
                f"puncture [{puncture.size}]: "
                + " ".join(map(str, puncture))
                + "\n"
            )
            f.write(
                f"shorten [{shorten.size}]: " + " ".join(map(str, shorten)) + "\n"
            )
        for r, c in zip(rows, cols):
            f.write(f"{r} {c}\n")


def parse_alist(path: str) -> ParsedCode:
    """Parse MacKay's alist format (not in the reference, but the de-facto
    LDPC interchange format users will bring along).

    Layout: ``n m`` / ``max_dv max_dc`` / per-column degrees / per-row
    degrees / per-column 1-based row lists (0-padded) / per-row column
    lists.
    """
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    n = int(next(it))
    m = int(next(it))
    max_dv = int(next(it))
    next(it)  # max_dc
    col_deg = [int(next(it)) for _ in range(n)]
    [int(next(it)) for _ in range(m)]  # row degrees (redundant)
    rows_list: list[int] = []
    cols_list: list[int] = []
    for v in range(n):
        for _ in range(max_dv):
            r = int(next(it))
            if r > 0:  # 0 entries are padding
                rows_list.append(r - 1)
                cols_list.append(v)
    # the per-row lists that follow are redundant; ignore the remainder
    if len(cols_list) != sum(col_deg):
        raise ValueError(f"{path}: alist degree lists inconsistent")
    order = np.lexsort((np.asarray(cols_list), np.asarray(rows_list)))
    return ParsedCode(
        rows=np.asarray(rows_list, dtype=np.int32)[order],
        cols=np.asarray(cols_list, dtype=np.int32)[order],
        nc=n,
        mc=m,
        puncture=np.zeros(0, np.int32),
        shorten=np.zeros(0, np.int32),
    )


def write_alist(path: str, rows: np.ndarray, cols: np.ndarray, nc: int, mc: int) -> None:
    """Write H in alist format."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    col_lists = [sorted(rows[cols == v].tolist()) for v in range(nc)]
    row_lists = [sorted(cols[rows == r].tolist()) for r in range(mc)]
    max_dv = max((len(x) for x in col_lists), default=0)
    max_dc = max((len(x) for x in row_lists), default=0)
    with open(path, "w") as f:
        f.write(f"{nc} {mc}\n{max_dv} {max_dc}\n")
        f.write(" ".join(str(len(x)) for x in col_lists) + "\n")
        f.write(" ".join(str(len(x)) for x in row_lists) + "\n")
        for lst in col_lists:
            padded = [v + 1 for v in lst] + [0] * (max_dv - len(lst))
            f.write(" ".join(map(str, padded)) + "\n")
        for lst in row_lists:
            padded = [v + 1 for v in lst] + [0] * (max_dc - len(lst))
            f.write(" ".join(map(str, padded)) + "\n")


def write_results_file(
    path: str,
    rows: Sequence[str],
    header: str = "snr fer ber frames avg_iter frame_time",
    comment: str = "",
) -> None:
    """Atomically rewrite the whole results table, mirroring the reference's
    rewrite-on-every-frame-error behaviour (``src/sim/ldpcsim.cpp:221-229``).

    ``comment`` (written as a ``#``-prefixed line above the column header)
    records the decode path actually used — kernel/transport/dtype and any
    capability fallback — so a results file is self-describing about which
    numerics class produced it."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        if comment:
            f.write(f"# {comment}\n")
        f.write(header + "\n")
        for row in rows:
            if row:
                f.write(row + "\n")
    os.replace(tmp, path)


def format_result_row(
    x: float,
    fer: float,
    ber: float,
    frames: int,
    avg_iter: float,
    frame_time_s: Optional[float] = None,
) -> str:
    """One results-file row in the reference's column format
    (``src/sim/ldpcsim.cpp:211-217``)."""
    base = f"{x:f} {fer:.3e} {ber:.3e} {frames} {avg_iter:.3e}"
    if frame_time_s is not None:
        base += f" {frame_time_s:.6f}"
    return base
