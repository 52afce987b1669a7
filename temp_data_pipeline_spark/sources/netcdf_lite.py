"""Minimal pure-Python NetCDF classic-format reader/writer.

Implements the public NetCDF classic file format (CDF-1 magic
``CDF\\x01`` and the 64-bit-offset CDF-2 variant) from the published
format spec — header (dims, global attrs, vars+attrs) followed by
fixed-size then record data, all big-endian. This is the third decode
fallback for the ERA5 source (reference fetch/era5_hourly.py:264-347
uses xarray, then netCDF4): neither library ships in this container,
and this reader lets the distributed `binaryFile` + mapInPandas path
(sources/era5.py) execute end-to-end rather than stub out.

Scope (documented subset, enough for CDS-style ERA5 singles files and
test fixtures):
- types: byte, char, short, int, float, double
- fixed and record (unlimited) dimensions
- CF packing attrs: scale_factor, add_offset, _FillValue,
  missing_value; CF time units "``<unit>`` since ``<epoch>``"
- NOT handled: NetCDF-4/HDF5 containers (magic ``\\x89HDF``) — those
  need h5py/netCDF4 and raise a clear ValueError here.

The writer emits fixed-dimension CDF-1 files and exists for fixtures
and round-trip tests; it is spec-compliant, so xarray/netCDF4 read its
output on clusters where they are installed.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np

_NC_TYPES = {
    1: ("b", 1),  # NC_BYTE
    2: ("c", 1),  # NC_CHAR
    3: ("h", 2),  # NC_SHORT
    4: ("i", 4),  # NC_INT
    5: ("f", 4),  # NC_FLOAT
    6: ("d", 8),  # NC_DOUBLE
}
_NP_DTYPE = {1: ">i1", 2: "S1", 3: ">i2", 4: ">i4", 5: ">f4", 6: ">f8"}
_TYPE_OF_DTYPE = {"int8": 1, "int16": 3, "int32": 4, "float32": 5, "float64": 6}

_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C


@dataclass
class NcVar:
    dims: tuple[str, ...]
    attrs: dict
    data: np.ndarray


@dataclass
class NcFile:
    dims: dict  # name -> size (record dim reported at its actual count)
    attrs: dict
    vars: dict = field(default_factory=dict)  # name -> NcVar


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def _take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated NetCDF classic file")
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def name(self) -> str:
        n = self.i4()
        s = self._take(n).decode("utf-8")
        self.pos += (4 - n % 4) % 4  # names pad to 4-byte boundary
        return s

    def values(self, nc_type: int, nelems: int):
        _, size = _NC_TYPES[nc_type]
        raw = self._take(size * nelems)
        self.pos += (4 - (size * nelems) % 4) % 4
        if nc_type == 2:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=_NP_DTYPE[nc_type])
        return arr[0].item() if nelems == 1 else arr.tolist()

    def att_list(self) -> dict:
        tag, count = self.i4(), self.i4()
        if tag == 0 and count == 0:
            return {}
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attribute-list tag {tag}")
        out = {}
        for _ in range(count):
            nm = self.name()
            out[nm] = self.values(self.i4(), self.i4())
        return out


def read_netcdf_classic(content: bytes) -> NcFile:
    """Parse a classic-format NetCDF byte string into dims/attrs/vars
    (raw values — apply `cf_decode` / `cf_decode_time` for CF
    unpacking)."""
    if content[:4] == b"\x89HDF":
        raise ValueError(
            "NetCDF-4/HDF5 container — needs netCDF4/h5py, not the classic reader"
        )
    if content[:3] != b"CDF" or content[3] not in (1, 2):
        raise ValueError("not a classic NetCDF file (bad magic)")
    offset64 = content[3] == 2
    r = _Reader(content)
    r.pos = 4
    numrecs = r.i4()

    dim_names: list[str] = []
    dim_sizes: list[int] = []
    tag, count = r.i4(), r.i4()
    if tag not in (0, _NC_DIMENSION):
        raise ValueError(f"bad dimension-list tag {tag}")
    for _ in range(count if tag else 0):
        dim_names.append(r.name())
        dim_sizes.append(r.i4())
    rec_dim = dim_sizes.index(0) if 0 in dim_sizes else None

    gattrs = r.att_list()

    tag, count = r.i4(), r.i4()
    if tag not in (0, _NC_VARIABLE):
        raise ValueError(f"bad variable-list tag {tag}")
    headers = []
    for _ in range(count if tag else 0):
        nm = r.name()
        dimids = [r.i4() for _ in range(r.i4())]
        attrs = r.att_list()
        nc_type, vsize = r.i4(), r.i4()
        begin = struct.unpack(">q", r._take(8))[0] if offset64 else r.i4()
        headers.append((nm, dimids, attrs, nc_type, vsize, begin))

    rec_vars = [h for h in headers if rec_dim is not None and rec_dim in h[1]]
    # one-record-var special case: the spec drops vsize padding there
    recsize = (
        rec_vars[0][4]
        if len(rec_vars) == 1
        else sum(h[4] for h in rec_vars)
    )

    out = NcFile(
        dims={
            n: (numrecs if s == 0 else s) for n, s in zip(dim_names, dim_sizes)
        },
        attrs=gattrs,
    )
    for nm, dimids, attrs, nc_type, vsize, begin in headers:
        shape = [dim_sizes[d] for d in dimids]
        dtype = np.dtype(_NP_DTYPE[nc_type])
        if rec_dim is not None and rec_dim in dimids:
            if dimids[0] != rec_dim:
                raise ValueError("record dimension must be outermost")
            per_rec = int(np.prod(shape[1:], dtype=np.int64)) if shape[1:] else 1
            recs = []
            for rec in range(numrecs):
                start = begin + rec * recsize
                recs.append(
                    np.frombuffer(
                        content[start : start + per_rec * dtype.itemsize],
                        dtype=dtype,
                        count=per_rec,
                    )
                )
            data = (
                np.stack(recs).reshape([numrecs] + shape[1:])
                if recs
                else np.empty([0] + shape[1:], dtype=dtype)
            )
        else:
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            data = np.frombuffer(
                content[begin : begin + n * dtype.itemsize], dtype=dtype, count=n
            ).reshape(shape)
        out.vars[nm] = NcVar(
            dims=tuple(dim_names[d] for d in dimids), attrs=attrs, data=data
        )
    return out


def cf_decode(var: NcVar) -> np.ndarray:
    """Apply _FillValue/missing_value masking and scale_factor/
    add_offset packing (CF conventions); returns float64 with NaN
    where masked."""
    out = var.data.astype(np.float64)
    for key in ("_FillValue", "missing_value"):
        if key in var.attrs:
            out[var.data == var.attrs[key]] = np.nan
    scale = float(var.attrs.get("scale_factor", 1.0))
    offset = float(var.attrs.get("add_offset", 0.0))
    return out * scale + offset


_UNIT_US = {
    "seconds": 1_000_000,
    "second": 1_000_000,
    "minutes": 60_000_000,
    "hours": 3_600_000_000,
    "hour": 3_600_000_000,
    "days": 86_400_000_000,
}


def cf_decode_time(var: NcVar) -> np.ndarray:
    """Decode a CF time coordinate ("<unit> since <epoch>") to
    datetime64[us] (standard/proleptic-gregorian calendar)."""
    units = var.attrs.get("units", "")
    try:
        unit, _, epoch = units.partition(" since ")
        base = _parse_epoch(epoch.strip())
        step = _UNIT_US[unit.strip().lower()]
    except (KeyError, ValueError) as exc:
        raise ValueError(f"unsupported time units: {units!r}") from exc
    vals = var.data.astype(np.int64) * step
    return np.datetime64(base, "us") + vals.astype("timedelta64[us]")


def _parse_epoch(s: str) -> datetime:
    s = s.removesuffix("Z").strip()
    for fmt in (
        "%Y-%m-%d %H:%M:%S.%f",
        "%Y-%m-%d %H:%M:%S",
        "%Y-%m-%d %H:%M",
        "%Y-%m-%d",
        "%Y-%m-%dT%H:%M:%S",
    ):
        try:
            return datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable epoch {s!r}")


def parse_era5_t2m(content: bytes, lat: float, lon: float):
    """Decode an ERA5 2m-temperature file and select the grid point
    nearest (lat, lon) — the pure-python analogue of the reference's
    xarray/netCDF4 parsers (fetch/era5_hourly.py:264-347).

    Returns (times: datetime64[us] array, temp_k: float64 array).
    """
    f = read_netcdf_classic(content)
    temp_name = "t2m" if "t2m" in f.vars else "2m_temperature"
    time_name = "time" if "time" in f.vars else "valid_time"
    lats = cf_decode(f.vars["latitude"])
    lons = cf_decode(f.vars["longitude"])
    li = int(np.argmin(np.abs(lats - lat)))
    lo = int(np.argmin(np.abs(lons - lon)))
    tv = f.vars[temp_name]
    idx = []
    for d in tv.dims:
        if d == "latitude":
            idx.append(li)
        elif d == "longitude":
            idx.append(lo)
        else:
            idx.append(slice(None))
    temp_k = cf_decode(tv)[tuple(idx)].reshape(-1)
    times = cf_decode_time(f.vars[time_name])
    return times, temp_k


# ---------------------------------------------------------------------------
# Writer (fixtures / round-trip tests; fixed dims, CDF-1)
# ---------------------------------------------------------------------------


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * ((4 - len(b) % 4) % 4)


def _name_bytes(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _attr_bytes(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    out = struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))
    for k, v in attrs.items():
        out += _name_bytes(k)
        if isinstance(v, str):
            raw = v.encode("utf-8")
            out += struct.pack(">ii", 2, len(raw)) + _pad4(raw)
        else:
            arr = np.atleast_1d(np.asarray(v))
            nc_type = _TYPE_OF_DTYPE[arr.dtype.name]
            out += struct.pack(">ii", nc_type, arr.size)
            out += _pad4(arr.astype(_NP_DTYPE[nc_type]).tobytes())
    return out


def write_netcdf_classic(
    dims: dict, variables: dict, gattrs: dict | None = None
) -> bytes:
    """Serialize {dim: size} + {var: (dims, attrs, ndarray)} to CDF-1
    bytes. Fixed dimensions only (a time coordinate works fine as a
    fixed dim; xarray/netCDF4 read the output unchanged)."""
    dim_ids = {n: i for i, n in enumerate(dims)}
    header = b"CDF\x01" + struct.pack(">i", 0)  # numrecs=0 (no record dim)
    header += struct.pack(">ii", _NC_DIMENSION, len(dims))
    for n, size in dims.items():
        header += _name_bytes(n) + struct.pack(">i", size)
    header += _attr_bytes(gattrs or {})

    prepared = []
    for name, (vdims, attrs, data) in variables.items():
        arr = np.asarray(data)
        nc_type = _TYPE_OF_DTYPE[arr.dtype.name]
        payload = _pad4(arr.astype(_NP_DTYPE[nc_type]).tobytes())
        prepared.append((name, vdims, attrs, nc_type, payload))

    # var headers have fixed size once names/attrs are known: lay out
    # data sequentially after the header
    def var_header(name, vdims, attrs, nc_type, vsize, begin):
        out = _name_bytes(name)
        out += struct.pack(">i", len(vdims))
        for d in vdims:
            out += struct.pack(">i", dim_ids[d])
        out += _attr_bytes(attrs)
        out += struct.pack(">iii", nc_type, vsize, begin)
        return out

    header += struct.pack(">ii", _NC_VARIABLE, len(prepared))
    fixed = sum(
        len(var_header(n, d, a, t, 0, 0)) for n, d, a, t, _ in prepared
    )
    begin = len(header) + fixed
    body = b""
    for name, vdims, attrs, nc_type, payload in prepared:
        header += var_header(name, vdims, attrs, nc_type, len(payload), begin)
        body += payload
        begin += len(payload)
    return header + body
