"""Parse a jax.profiler .xplane.pb directly (raw protobuf wire format; no
tensorflow/tensorboard dependency works in this image) and print the top
HLO ops by summed duration on the TPU's "XLA Ops" line.

The XSpace/XPlane/XLine/XEvent schema is tsl/profiler/protobuf/xplane.proto;
field numbers are hardcoded here (stable since 2020).

Usage: python tools/xplane_ops.py <xplane.pb> [steps] [top_n]
"""

import sys
from collections import defaultdict


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        r |= (b & 0x7F) << s
        i += 1
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    event_meta = {}
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = v.decode()
        elif fn == 3:
            lines.append(v)
        elif fn == 4:  # map<int64, XEventMetadata>
            k = None
            meta_name = None
            for mfn, _, mv in fields(v):
                if mfn == 1:
                    k = mv
                elif mfn == 2:  # XEventMetadata
                    for efn, _, ev in fields(mv):
                        if efn == 2:
                            meta_name = ev.decode()
            if k is not None:
                event_meta[k] = meta_name or str(k)
    return name, lines, event_meta


def parse_line(buf):
    name = ""
    events = []
    for fn, wt, v in fields(buf):
        if fn == 2:
            name = v.decode()
        elif fn == 11 and not name:
            name = v.decode()
        elif fn == 4 and wt == 2:
            mid = dur = 0
            for efn, _, ev in fields(v):
                if efn == 1:
                    mid = ev
                elif efn == 3:
                    dur = ev
            events.append((mid, dur))
    return name, events


def main():
    path = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    buf = open(path, "rb").read()
    for fn, wt, v in fields(buf):
        if fn != 1:
            continue
        pname, plines, emeta = parse_plane(v)
        if "TPU" not in pname or "#" in pname.lower():
            # keep it simple: report every device plane
            pass
        if not plines:
            continue
        shown_header = False
        for lb in plines:
            lname, events = parse_line(lb)
            if not events:
                continue
            tot = sum(d for _, d in events) / 1e12
            if "op" not in lname.lower():
                continue
            if not shown_header:
                print(f"\n=== plane {pname} ===")
                shown_header = True
            agg = defaultdict(float)
            cnt = defaultdict(int)
            for mid, dur in events:
                agg[emeta.get(mid, str(mid))] += dur
                cnt[emeta.get(mid, str(mid))] += 1
            total = sum(agg.values())
            print(
                f"line '{lname}': {len(events)} events, "
                f"{tot*1e3/steps:.3f} ms/step busy"
            )
            acc = 0.0
            for name, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
                acc += ps
                print(
                    f"  {ps/1e9/steps:8.3f} ms/step {100*acc/total:5.1f}%cum "
                    f"x{cnt[name]//steps:<4d} {name[:120]}"
                )


if __name__ == "__main__":
    main()
