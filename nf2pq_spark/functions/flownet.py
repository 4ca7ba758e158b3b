"""Network-flow helper functions (the reference's domain vocabulary).

nf2pq's flow records carry IPv4/IPv6 addresses, ports, and TCP flag bytes
(nfdump field model — SURVEY.md §1.1). These helpers re-express the usual
flow-report primitives as JVM-side column expressions (no Python UDFs):

- IPv4 text ↔ 32-bit integer conversion,
- CIDR prefix extraction / membership tests,
- TCP control-bit decoding (the nfdump ``flg`` column, e.g. ``.A..SF``),
- port → service classification.

Everything here is pure expression composition, so it pushes through
codegen and is usable in both batch and streaming plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OCTET_WEIGHTS = (16777216, 65536, 256, 1)


def ipv4_to_long(ip: Column) -> Column:
    """Dotted-quad string → unsigned 32-bit value in a LongType."""
    parts = F.split(ip, r"\.")
    out = F.lit(0).cast("long")
    for i, w in enumerate(_OCTET_WEIGHTS):
        out = out + F.element_at(parts, i + 1).cast("long") * F.lit(w)
    return out


def long_to_ipv4(v: Column) -> Column:
    """Long → dotted-quad string."""
    octets = [((v.bitwiseAND(F.lit(0xFFFFFFFF))) / F.lit(w)).cast("long") % 256
              for w in _OCTET_WEIGHTS]
    return F.concat_ws(".", *[o.cast("string") for o in octets])


def ip_prefix(ip: Column, bits: int) -> Column:
    """Network address of ``ip``'s /bits prefix, as a long."""
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF
    return ipv4_to_long(ip).bitwiseAND(F.lit(mask))


def in_cidr(ip: Column, cidr: str) -> Column:
    """Boolean: is dotted-quad ``ip`` inside ``cidr`` ('a.b.c.d/len')?"""
    net, _, length = cidr.partition("/")
    bits = int(length)
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF
    net_val = 0
    for part, w in zip(net.split("."), _OCTET_WEIGHTS):
        net_val += int(part) * w
    return ipv4_to_long(ip).bitwiseAND(F.lit(mask)) == F.lit(net_val & mask)


#: nfdump-style flag order: URG ACK PSH RST SYN FIN (high→low bit 5..0).
_TCP_FLAGS = [(32, "U"), (16, "A"), (8, "P"), (4, "R"), (2, "S"), (1, "F")]


def decode_tcp_flags(bits: Column) -> Column:
    """TCP control-bits byte → nfdump-style string, e.g. 18 → '.A...S.'→'.A..S.'."""
    parts = [F.when(bits.bitwiseAND(F.lit(m)) > 0, F.lit(c)).otherwise(F.lit("."))
             for m, c in _TCP_FLAGS]
    return F.concat(*parts)


def service_class(port: Column) -> Column:
    """Coarse well-known-port classification for flow rollups."""
    return (
        F.when(port.isin(80, 443, 8080, 8443), "web")
        .when(port.isin(53, 853), "dns")
        .when(port.isin(25, 465, 587, 110, 143, 993, 995), "mail")
        .when(port.isin(22, 23), "shell")
        .when(port < 1024, "system")
        .otherwise("ephemeral")
    )
