"""Drop-in, file-based API mirroring the reference Python module ``gbdc``
(gbdlib.cc:317-336) — a user of the reference can switch imports and keep
their call sites.

All 17 functions: gbdhash, isohash, opbhash, pqbfhash, wcnfhash,
wcnfisohash, extract_base_features, extract_gate_features,
extract_wcnf_base_features, extract_opb_base_features,
base_feature_names, gate_feature_names, wcnf_base_feature_names,
opb_base_feature_names, cnf2kis, sanitize, version.

Semantics mirrored from gbdlib.cc:
* filenames may be raw or ``.xz/.lzma/.bz2/.gz`` compressed (stdlib codecs
  replace libarchive, StreamBuffer.h:91-107);
* ``extract_*`` returns a flat dict whose first key is
  ``<prefix>_runtime`` carrying seconds, or the sentinel strings
  ``"timeout"`` / ``"memout"`` instead of raising (gbdlib.cc:90-111);
* resource limits: ``rlim`` seconds of CPU time (SIGPROF timer ≈ the
  reference's RLIMIT_CPU), ``mlim`` MB of address space (RLIMIT_AS,
  restored afterwards) — ResourceLimits.h:95-201.

This surface is per-file/driver-side; the distributed equivalents are the
DataFrame stages in operators/extract.py.
"""

from __future__ import annotations

import bz2
import gzip
import lzma
import os
import signal
import time

import numpy as np

from .kernels import gates as _gates
from .kernels import hashes as _hashes
from .kernels import opb as _opb
from .kernels import tokens as _tokens
from .kernels import transforms as _transforms
from .kernels import wcnf as _wcnf
from .kernels.cnf import BASE_FEATURES_NAMES, cnf_base_features
from .kernels.scan import Scanner

__all__ = [
    "gbdhash", "isohash", "opbhash", "pqbfhash", "wcnfhash", "wcnfisohash",
    "extract_base_features", "extract_gate_features",
    "extract_wcnf_base_features", "extract_opb_base_features",
    "base_feature_names", "gate_feature_names",
    "wcnf_base_feature_names", "opb_base_feature_names",
    "cnf2kis", "sanitize", "version",
]

__version__ = "1.0.0"


class TimeLimitExceeded(Exception):
    pass


def read_text(filename: str) -> str:
    """Transparent decompression by extension (Main.cc:105-125 sniffing)."""
    ext = os.path.splitext(filename)[1].lower()
    openers = {".xz": lzma.open, ".lzma": lzma.open, ".bz2": bz2.open, ".gz": gzip.open}
    opener = openers.get(ext, open)
    with opener(filename, "rt") as f:  # type: ignore[arg-type]
        return f.read()


class _Limits:
    """CPU-seconds (profiling timer) + address-space limits, restored on
    exit; exceptions surface as sentinel dict values, never raises to the
    caller (ResourceLimits.h:134-201)."""

    def __init__(self, rlim: int = 0, mlim: int = 0) -> None:
        self.rlim, self.mlim = rlim, mlim
        self.t0 = time.process_time()

    def __enter__(self):
        if self.rlim:
            def _on_prof(signum, frame):
                raise TimeLimitExceeded()

            self._old_handler = signal.signal(signal.SIGPROF, _on_prof)
            signal.setitimer(signal.ITIMER_PROF, self.rlim)
        if self.mlim:
            import resource

            self._old_as = resource.getrlimit(resource.RLIMIT_AS)
            try:
                resource.setrlimit(
                    resource.RLIMIT_AS, (self.mlim * 1024 * 1024, self._old_as[1])
                )
            except ValueError:
                self._old_as = None
        return self

    def __exit__(self, *exc):
        if self.rlim:
            signal.setitimer(signal.ITIMER_PROF, 0)
            signal.signal(signal.SIGPROF, self._old_handler)
        if self.mlim and getattr(self, "_old_as", None) is not None:
            import resource

            resource.setrlimit(resource.RLIMIT_AS, self._old_as)
        return False

    def runtime(self) -> float:
        return time.process_time() - self.t0


# ------------------------------------------------------------------ hashes
def gbdhash(filename: str) -> str:
    return _hashes.gbdhash_cnf_text(read_text(filename))


def isohash(filename: str) -> str:
    return _hashes.isohash_cnf(_tokens.tokenize_dimacs(read_text(filename)))


def opbhash(filename: str) -> str:
    return _hashes.gbdhash_opb_text(read_text(filename))


def pqbfhash(filename: str) -> str:
    return _hashes.gbdhash_pqbf_text(read_text(filename))


def wcnfhash(filename: str) -> str:
    return _hashes.gbdhash_wcnf_text(read_text(filename))


def _parse_wcnf(text: str) -> tuple[list[int], int, np.ndarray]:
    """WCNF text -> (weights, top, flat token stream); new-format 'h'
    clauses carry the HARD sentinel weight."""
    weights: list[int] = []
    toks: list[int] = []
    top = 0
    sc = Scanner(text)
    while sc.skip_whitespace():
        c = sc.peek()
        if c == "c":
            if not sc.skip_line():
                break
        elif c == "p":
            sc.skip()
            sc.skip_whitespace()
            sc.skip_string("wcnf")
            sc.skip_number()
            sc.skip_number()
            top = int(sc.read_number() or "0")
            sc.skip_line()
        elif c == "h":
            sc.skip()
            weights.append(_hashes.HARD)
            while (n := sc.read_number()) is not None:
                toks.append(int(n))
                if n == "0":
                    break
        else:
            weights.append(int(sc.read_number() or "0"))
            while (n := sc.read_number()) is not None:
                toks.append(int(n))
                if n == "0":
                    break
    return weights, top, np.asarray(toks, dtype=np.int64)


def wcnfisohash(filename: str) -> str:
    w, top, t = _parse_wcnf(read_text(filename))
    return _hashes.isohash_wcnf(w, top, t)


# ----------------------------------------------------------- extractors
def _extract(filename: str, rlim: int, mlim: int, prefix: str, names, fn):
    key = f"{prefix}_runtime"
    with _Limits(rlim, mlim) as lim:
        try:
            values = fn(filename)
            rec: dict[str, float | str] = {key: lim.runtime()}
            for n, v in zip(names, values):
                rec[n] = float(v)
            return rec
        except TimeLimitExceeded:
            return {key: "timeout"}
        except MemoryError:
            return {key: "memout"}


def extract_base_features(filename: str, rlim: int = 0, mlim: int = 0):
    return _extract(
        filename, rlim, mlim, "base_features", BASE_FEATURES_NAMES,
        lambda fn: cnf_base_features(_tokens.tokenize_dimacs(read_text(fn))),
    )


def extract_gate_features(filename: str, rlim: int = 0, mlim: int = 0):
    return _extract(
        filename, rlim, mlim, "gate_features", _gates.GATE_FEATURE_NAMES,
        lambda fn: _gates.gate_features(_tokens.tokenize_dimacs(read_text(fn))),
    )


def extract_wcnf_base_features(filename: str, rlim: int = 0, mlim: int = 0):
    def run(fn):
        w, top, t = _parse_wcnf(read_text(fn))
        return _wcnf.wcnf_base_features(w, top, t)

    return _extract(
        filename, rlim, mlim, "base_features", _wcnf.WCNF_BASE_FEATURES_NAMES, run
    )


def extract_opb_base_features(filename: str, rlim: int = 0, mlim: int = 0):
    return _extract(
        filename, rlim, mlim, "base_features", _opb.OPB_BASE_FEATURES_NAMES,
        lambda fn: _opb.opb_base_features(read_text(fn)),
    )


# ------------------------------------------------------------- name lists
def base_feature_names() -> list[str]:
    return ["base_features_runtime"] + list(BASE_FEATURES_NAMES)


def gate_feature_names() -> list[str]:
    return ["gate_features_runtime"] + list(_gates.GATE_FEATURE_NAMES)


def wcnf_base_feature_names() -> list[str]:
    return ["base_features_runtime"] + list(_wcnf.WCNF_BASE_FEATURES_NAMES)


def opb_base_feature_names() -> list[str]:
    return ["base_features_runtime"] + list(_opb.OPB_BASE_FEATURES_NAMES)


# ----------------------------------------------------------- transformers
def sanitize(filename: str, rlim: int = 0, mlim: int = 0) -> bool:
    """Print the sanitized CNF (recomputed header, order-preserving
    dup-literal removal, tautology drop) to stdout (Normalize.h:80-120)."""
    with _Limits(rlim, mlim):
        try:
            toks = _tokens.tokenize_dimacs(read_text(filename))
            n_vars, n_clauses = _transforms.determine_counts(toks)
            print(f"p cnf {n_vars} {n_clauses}")
            out = _transforms.sanitize_tokens(toks)
            cur: list[str] = []
            for t in out.tolist():
                if t == 0:
                    print(" ".join(cur) + " 0" if cur else "0")
                    cur = []
                else:
                    cur.append(str(t))
            return True
        except (TimeLimitExceeded, MemoryError):
            return False


def cnf2kis(
    filename: str,
    output: str,
    max_edges: int = 0,
    max_nodes: int = 0,
    rlim: int = 0,
    mlim: int = 0,
    flim: int = 0,
) -> dict:
    """CNF -> k-Independent-Set instance file + metadata dict
    {nodes, edges, k, hash} with early-out sentinel hashes
    (gbdlib.cc:249-298; file format IndependentSet.h:72-113)."""
    result: dict[str, object] = {"nodes": 0, "edges": 0, "k": 0}
    with _Limits(rlim, mlim):
        try:
            toks = _tokens.tokenize_dimacs(read_text(filename))
            counts = _transforms.cnf2kis_counts(toks)
            result.update(
                {"nodes": counts["nodes"], "edges": counts["edges"], "k": counts["k"]}
            )
            if (max_edges and counts["edges"] > max_edges) or (
                max_nodes and counts["nodes"] > max_nodes
            ):
                result["hash"] = "fileout"
                return result

            lines = [
                f"c satisfiable iff maximum independent set size is {counts['k']}",
                "c kis nNodes nEdges k",
                f"p kis {counts['nodes']} {counts['edges']} {counts['k']}",
            ]
            lines += [f"{a} {b} 0" for a, b in _transforms.cnf2kis_edges(toks).tolist()]
            payload = "\n".join(lines) + "\n"
            if flim and len(payload) > flim * 1024 * 1024:
                raise OSError("file size limit")
            # compressed sink parity (StreamCompressor.h:48-105): the
            # reference xz-compresses with the uncompressed size known
            # up front; lzma's one-shot write is the stdlib equivalent
            # (roundtrip mirrored from tests_streamcompressor.cc:11-61)
            ext = os.path.splitext(output)[1].lower()
            openers = {".xz": lzma.open, ".lzma": lzma.open,
                       ".bz2": bz2.open, ".gz": gzip.open}
            with openers.get(ext, open)(output, "wt") as f:  # type: ignore[arg-type]
                f.write(payload)
            result["hash"] = _hashes.gbdhash_cnf_text(payload)
            result["local"] = output
            return result
        except (TimeLimitExceeded, MemoryError, OSError) as e:
            if os.path.exists(output):
                os.unlink(output)
            result["hash"] = "memout" if isinstance(e, MemoryError) else (
                "timeout" if isinstance(e, TimeLimitExceeded) else "fileout"
            )
            return result


def version() -> str:
    return __version__
