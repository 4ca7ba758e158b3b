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
    """Dotted-quad string → unsigned 32-bit value in a LongType.

    Malformed input ('1.2.3', '1.2.3.x', '999.1.1.1', '1.2.3.4.5') yields
    NULL rather than a job-killing error: under Spark 4's default ANSI
    mode a plain element_at on a short array raises
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT and a plain cast raises
    CAST_INVALID_INPUT — one truncated record (or IPv6 text in a mixed
    column) would abort the whole flow report. try_element_at/try_cast
    stay inside codegen; NULL then propagates through ip_prefix/in_cidr
    (membership test → NULL → filtered), the collector-correct behavior.
    """
    parts = F.split(ip, r"\.")
    out = F.lit(0).cast("long")
    for i, w in enumerate(_OCTET_WEIGHTS):
        octet = F.try_element_at(parts, F.lit(i + 1)).try_cast("long")
        octet = F.when((octet >= 0) & (octet <= 255), octet)  # else NULL
        out = out + octet * F.lit(w)
    return F.when(F.size(parts) == 4, out)


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
    """Boolean: is dotted-quad ``ip`` inside ``cidr`` ('a.b.c.d/len')?

    The network constant is validated and normalized driver-side with
    stdlib ``ipaddress`` (the exact pattern :func:`in_cidr6` uses) — the
    previous hand-rolled parse silently accepted malformed networks like
    ``'300.0.0.0/8'`` or ``'10.0.0/8'`` and produced an always-false
    predicate instead of an error."""
    import ipaddress

    net = ipaddress.IPv4Network(cidr, strict=False)
    mask = int(net.netmask)
    return (ipv4_to_long(ip).bitwiseAND(F.lit(mask))
            == F.lit(int(net.network_address)))


#: nfdump-style flag order: URG ACK PSH RST SYN FIN (high→low bit 5..0).
_TCP_FLAGS = [(32, "U"), (16, "A"), (8, "P"), (4, "R"), (2, "S"), (1, "F")]


def decode_tcp_flags(bits: Column) -> Column:
    """TCP control-bits byte → nfdump-style string, e.g. 18 → '.A..S.'.

    NULL propagates (a missing flags value must not render as '......',
    indistinguishable from an explicit no-flags packet)."""
    parts = [F.when(bits.bitwiseAND(F.lit(m)) > 0, F.lit(c)).otherwise(F.lit("."))
             for m, c in _TCP_FLAGS]
    return F.when(bits.isNotNull(), F.concat(*parts))


def ipv6_normalize(ip: Column) -> Column:
    """IPv6 text → canonical 32-char lowercase hex string (no colons).

    Expands ``::`` and left-pads each group to 4 nibbles, entirely with
    built-in array/string expressions (split / filter / array_repeat /
    transform / lpad), so it stays inside codegen like the IPv4 helpers.
    Handles ``::``-only, leading/trailing ``::``, and mixed-case input;
    IPv4-mapped forms (``::ffff:a.b.c.d``) are out of scope (the decoder
    emits pure hex groups).
    """
    parts = F.split(ip, "::")
    not_empty = lambda x: x != ""  # noqa: E731
    left = F.filter(F.split(F.element_at(parts, 1), ":"), not_empty)
    right = F.when(
        F.size(parts) > 1,
        F.filter(F.split(F.element_at(parts, 2), ":"), not_empty),
    ).otherwise(F.array().cast("array<string>"))
    fill = F.array_repeat(F.lit("0"), F.lit(8) - F.size(left) - F.size(right))
    groups = F.concat(left, fill, right)
    # malformed input → NULL, matching ipv4_to_long's contract: >8 groups
    # (negative fill → empty array_repeat → short key), more than one
    # '::', fewer than 8 groups WITHOUT a '::' to absorb the gap, or
    # non-hex group content previously produced a wrong-length/garbage
    # key that could spuriously match prefixes (r10 review)
    valid = (
        (F.size(parts) <= 2)
        & (F.size(left) + F.size(right) <= 8)
        & ((F.size(parts) == 2) | (F.size(left) == 8))
        & F.forall(groups, lambda g: g.rlike("^[0-9a-fA-F]{1,4}$"))
    )
    norm = F.array_join(
        F.transform(groups, lambda g: F.lpad(F.lower(g), 4, "0")), "")
    return F.when(valid, norm)


def ipv6_prefix(ip: Column, bits: int) -> Column:
    """Nibble-aligned prefix (bits % 4 == 0) of the canonical hex form —
    the natural grouping key for per-/32, /48, /64 flow rollups."""
    if bits % 4 != 0:
        raise ValueError("ipv6_prefix needs a nibble-aligned length; use in_cidr6")
    return F.substring(ipv6_normalize(ip), 1, bits // 4)


def in_cidr6(ip: Column, cidr: str) -> Column:
    """Boolean: is ``ip`` inside the IPv6 ``cidr`` ('net/len', any length)?

    Full nibbles compare as a hex-prefix string; a non-nibble-aligned
    remainder masks the next nibble via ``conv(hex, 16, 10)``. The network
    constant is normalized driver-side with stdlib ``ipaddress``.
    """
    import ipaddress

    net = ipaddress.IPv6Network(cidr, strict=False)
    bits = net.prefixlen
    net_hex = format(int(net.network_address), "032x")
    full = bits // 4
    rem = bits % 4
    norm = ipv6_normalize(ip)
    cond = F.substring(norm, 1, full) == F.lit(net_hex[:full])
    if rem:
        mask = (0xF << (4 - rem)) & 0xF
        nib = F.conv(F.substring(norm, full + 1, 1), 16, 10).cast("int")
        cond = cond & (nib.bitwiseAND(F.lit(mask)) == F.lit(int(net_hex[full], 16) & mask))
    return cond


def service_class(port: Column) -> Column:
    """Coarse well-known-port classification for flow rollups.

    NULL port → NULL (a missing port is unknown, not 'ephemeral' — the
    bare otherwise() silently classified NULLs; r10 review)."""
    chain = (
        F.when(port.isin(80, 443, 8080, 8443), "web")
        .when(port.isin(53, 853), "dns")
        .when(port.isin(25, 465, 587, 110, 143, 993, 995), "mail")
        .when(port.isin(22, 23), "shell")
        .when(port < 1024, "system")
        .otherwise("ephemeral")
    )
    return F.when(port.isNotNull(), chain)
