"""Minimal TensorBoard event-file READER (inverse of utils/tboard.py).

Parses the TFRecord framing + the Event/Summary protobuf wire format by hand
(the same tiny message subset the writer emits) and dumps scalars — no
tensorboard/tensorflow import. Gives offline access to the loss curves the
framework logs (reference observability surface, `runners/BaseRunner.py:56`).

    python scripts/read_tboard.py <logdir-or-event-file> [tag_prefix]
        -> CSV lines: tag,step,wall_time,value
"""

from __future__ import annotations

import os
import struct
import sys


def _read_varint(buf: bytes, i: int):
    shift, n = 0, 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v, i = _read_varint(buf, i)
        elif wt == 1:  # 64-bit
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:  # length-delimited
            ln, i = _read_varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:  # 32-bit
            v, i = buf[i:i + 4], i + 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _parse_summary_value(buf: bytes):
    tag, simple_value = None, None
    for field, wt, v in _fields(buf):
        if field == 1 and wt == 2:  # tag
            tag = v.decode("utf-8", "replace")
        elif field == 2 and wt == 5:  # simple_value
            simple_value = struct.unpack("<f", v)[0]
    return tag, simple_value


def parse_event(buf: bytes):
    """-> (wall_time, step, [(tag, value), ...]) for scalar events."""
    wall_time, step, scalars = 0.0, 0, []
    for field, wt, v in _fields(buf):
        if field == 1 and wt == 1:  # wall_time double
            wall_time = struct.unpack("<d", v)[0]
        elif field == 2 and wt == 0:  # step
            step = v
        elif field == 5 and wt == 2:  # summary
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 2:  # Summary.value
                    tag, sv = _parse_summary_value(v2)
                    if tag is not None and sv is not None:
                        scalars.append((tag, sv))
    return wall_time, step, scalars


def read_events(path: str):
    """Yield (tag, step, wall_time, value) from one event file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # length crc
            data = f.read(length)
            f.read(4)  # data crc
            if len(data) < length:
                return
            wall_time, step, scalars = parse_event(data)
            for tag, value in scalars:
                yield tag, step, wall_time, value


def read_dir(logdir: str):
    files = []
    if os.path.isfile(logdir):
        files = [logdir]
    else:
        for root, _, names in os.walk(logdir):
            files += [os.path.join(root, n) for n in names
                      if "tfevents" in n]
    for p in sorted(files):
        yield from read_events(p)


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    prefix = sys.argv[2] if len(sys.argv) > 2 else ""
    print("tag,step,wall_time,value")
    for tag, step, wall_time, value in read_dir(sys.argv[1]):
        if tag.startswith(prefix):
            print(f"{tag},{step},{wall_time:.3f},{value:.6f}")


if __name__ == "__main__":
    main()
