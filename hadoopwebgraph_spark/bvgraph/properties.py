"""BVGraph ``basename.properties`` metadata: parse, validate, write.

Mirrors the reference's load-time validation (HdfsBVGraph.java:346-369):
graphclass check, version <= 0, nodes <= 2^31-1, window/maxref/
minintervallength/zetak, and compressionflags unpacked as one 4-bit code id
per field (HdfsBVGraph.java:307-315; names resolved like string2Flags at
HdfsBVGraph.java:325-340).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

from .bitio import CODE_NAMES, DELTA, GAMMA, NIBBLE, UNARY, ZETA

BVGRAPH_VERSION = 0
GRAPHCLASS = "it.unimi.dsi.webgraph.BVGraph"

_FIELDS = ("outdegree", "block", "residual", "reference", "blockcount", "offset")
_FLAG_PREFIX = {
    "OUTDEGREES": 0,
    "BLOCKS": 1,
    "RESIDUALS": 2,
    "REFERENCES": 3,
    "BLOCK_COUNT": 4,
    "OFFSETS": 5,
}
_DEFAULT_CODES = (GAMMA, GAMMA, ZETA, UNARY, GAMMA, GAMMA)


@dataclass
class BVGraphProperties:
    nodes: int
    arcs: int
    window_size: int = 7
    max_ref_count: int = 3
    min_interval_length: int = 4
    zeta_k: int = 3
    version: int = BVGRAPH_VERSION
    graphclass: str = GRAPHCLASS
    compressionflags: str = ""

    # per-field code ids (bitio constants), resolved from compressionflags
    # (cached — this is consulted in the per-node decode hot path)
    @functools.cached_property
    def codes(self) -> tuple[int, int, int, int, int, int]:
        codes = list(_DEFAULT_CODES)
        for token in filter(None, (t.strip() for t in self.compressionflags.split("|"))):
            # token like "RESIDUALS_ZETA" / "BLOCK_COUNT_DELTA"
            for prefix, idx in _FLAG_PREFIX.items():
                if token.startswith(prefix + "_"):
                    code_name = token[len(prefix) + 1 :]
                    if code_name not in CODE_NAMES:
                        raise ValueError(f"compression flag {token!r} unknown")
                    codes[idx] = CODE_NAMES[code_name]
                    break
            else:
                raise ValueError(f"compression flag {token!r} unknown")
        return tuple(codes)

    @property
    def outdegree_code(self) -> int:
        return self.codes[0]

    @property
    def block_code(self) -> int:
        return self.codes[1]

    @property
    def residual_code(self) -> int:
        return self.codes[2]

    @property
    def reference_code(self) -> int:
        return self.codes[3]

    @property
    def block_count_code(self) -> int:
        return self.codes[4]

    @property
    def offset_code(self) -> int:
        return self.codes[5]

    def validate(self) -> None:
        if GRAPHCLASS.rsplit(".", 1)[-1] not in self.graphclass:
            raise ValueError(f"cannot load graphclass {self.graphclass!r}")
        if self.version > BVGRAPH_VERSION:
            raise ValueError(f"graph format version {self.version} > {BVGRAPH_VERSION}")
        if self.nodes > 2**31 - 1:
            raise ValueError(f"{self.nodes} nodes exceed the 2^31-1 int-ID limit")
        self.codes  # raises on unknown flags


def parse_properties(text: str) -> BVGraphProperties:
    props: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" in line:
            k, v = line.split("=", 1)
        elif ":" in line:
            k, v = line.split(":", 1)
        else:
            continue
        props[k.strip()] = v.strip()

    p = BVGraphProperties(
        nodes=int(props["nodes"]),
        arcs=int(props["arcs"]),
        window_size=int(props.get("windowsize", 7)),
        max_ref_count=int(props.get("maxrefcount", 3)),
        min_interval_length=int(props.get("minintervallength", 4)),
        zeta_k=int(props.get("zetak", 3)),
        version=int(props.get("version", 0)),
        graphclass=props.get("graphclass", GRAPHCLASS),
        compressionflags=props.get("compressionflags", ""),
    )
    p.validate()
    return p


def format_properties(p: BVGraphProperties) -> str:
    return (
        "#BVGraph properties\n"
        f"graphclass={p.graphclass}\n"
        f"version={p.version}\n"
        f"nodes={p.nodes}\n"
        f"arcs={p.arcs}\n"
        f"windowsize={p.window_size}\n"
        f"maxrefcount={p.max_ref_count}\n"
        f"minintervallength={p.min_interval_length}\n"
        f"zetak={p.zeta_k}\n"
        f"compressionflags={p.compressionflags}\n"
    )
