"""Analytic VPU/HBM/MXU roofline for DeblurGANv2 serving on one v5e.

VERDICT r4 item 1: BASELINE.md's flop-only "SoL 475 Mpix/s" is meaningless
for a depthwise-dominated backbone, so this walks the FPN-MobileNet
serving forward op by op at the harness shape and prices every op against
THREE measured ceilings:

  * HBM     — 700 GB/s sustained (micro_mobilenet.py's roofline base),
              with a lane-fill factor ceil(C/128)*128/C for C-channel
              NHWC operands: f32 tiles are (8 sublanes, 128 lanes).
              EMPIRICAL CALIBRATION (probe_lane_layout.py +
              micro_mobilenet.py, run on device in round 5): the factor
              is paid by CONVS over small-C operands (final conv 32->3:
              measured 12.4 ms ~= 14.8x logical roofline; pw/dw convs at
              C=16..96: 4-5x), while pure ELEMENTWISE passes do NOT pay
              it (tanh+skip+clip over (2048^2,3): 0.04 ms). The 'padded'
              floor below therefore models conv-bound stages well and
              over-prices the few standalone elementwise ops — it is an
              upper bound on the padded-layout regime, and the shipped
              phase-packed path (fpn_mobilenet.py phase_io; measured
              32.3 ms @2048) lands between the two floors as expected.
  * MXU     — measured bf16 matmul peak (micro_vpu.json, 8192^3).
  * VPU     — measured f32 fma issue rate (micro_vpu.json); depthwise
              3x3 convs are 9 fma/elem of VPU work, NOT MXU matmuls.

Per-op floor = max(hbm, mxu, vpu); model floor = sum over ops (the units
overlap across ops but not within one op's dependent chain — standard
roofline accounting). Two HBM variants are reported:

  * padded — every operand priced at lane-fill inflation (the
             small-C-conv regime the plain path lives in);
  * ideal  — logical bytes only: the floor a perfect layout reaches,
             and the regime the A100 runs in natively (NCHW tensors
             never pay lane fill — which is exactly why the derived
             A100-device 256 Mpix/s ~= the ideal floor here).

Writes benchmarks/roofline_mobilenet.json. Host-only: no TPU needed.
Reference architecture: /root/reference/src/deblurganv2/models/
fpn_mobilenet.py:62-147, mobilenet_v2.py:55-126.
"""

import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

HERE = os.path.dirname(os.path.abspath(__file__))

HBM_GBPS = 700.0
DSIZE = 4  # serving keeps f32 activations (zoo.py InstanceNorm note)


def _measured():
    mv = json.load(open(os.path.join(HERE, "micro_vpu.json")))
    return mv["bf16_matmul_peak_tflops"] * 1e12, mv["fma_gelem_s"] * 1e9


MXU_FLOPS, VPU_FMA_S = _measured()


def lane_factor(c):
    """HBM footprint multiplier of a C-channel NHWC f32 tensor."""
    return ((c + 127) // 128) * 128 / c


class Walk:
    def __init__(self, label):
        self.label = label
        self.ops = []

    def op(self, name, *, hw_in, cin, hw_out, cout, k=1, dw=False,
           norm_reads=0, elementwise=False):
        """One fused op group: conv (or elementwise pass) + its norm/act.

        hw_in/hw_out: spatial side (square). norm_reads: extra full reads
        of the output for train-mode norm statistics passes.
        """
        e_in = hw_in * hw_in * cin
        e_out = hw_out * hw_out * cout
        logical = (e_in + e_out * (1 + norm_reads)) * DSIZE
        padded = (e_in * lane_factor(cin)
                  + e_out * (1 + norm_reads) * lane_factor(cout)) * DSIZE
        if elementwise:
            mxu = 0.0
            vpu = e_out  # ~1 VPU op/elem; negligible next to HBM
        elif dw:
            mxu = 0.0
            vpu = e_out * k * k  # k^2 fma per output element on the VPU
        else:
            mxu = 2.0 * e_out * cin * k * k
            vpu = 0.0
        self.ops.append({
            "name": name,
            "hbm_ms_padded": padded / (HBM_GBPS * 1e9) * 1e3,
            "hbm_ms_ideal": logical / (HBM_GBPS * 1e9) * 1e3,
            "mxu_ms": mxu / MXU_FLOPS * 1e3,
            "vpu_ms": vpu / VPU_FMA_S * 1e3,
        })

    def totals(self):
        pad = sum(max(o["hbm_ms_padded"], o["mxu_ms"], o["vpu_ms"])
                  for o in self.ops)
        ideal = sum(max(o["hbm_ms_ideal"], o["mxu_ms"], o["vpu_ms"])
                    for o in self.ops)
        return pad, ideal

    def top(self, n=12):
        key = lambda o: max(o["hbm_ms_padded"], o["mxu_ms"], o["vpu_ms"])  # noqa: E731
        return [
            {**{k: round(v, 3) for k, v in o.items() if k != "name"},
             "name": o["name"],
             "bound": max(("hbm", o["hbm_ms_padded"]), ("mxu", o["mxu_ms"]),
                          ("vpu", o["vpu_ms"]), key=lambda t: t[1])[0]}
            for o in sorted(self.ops, key=key, reverse=True)[:n]
        ]


# MobileNetV2 inverted-residual rows used by the FPN (features 1..15):
# (expand_ratio, out_ch, stride) — fpn_mobilenet.py _MNV2_FEATURES.
MNV2 = [
    (1, 16, 1),
    (6, 24, 2), (6, 24, 1),
    (6, 32, 2), (6, 32, 1), (6, 32, 1),
    (6, 64, 2), (6, 64, 1), (6, 64, 1), (6, 64, 1),
    (6, 96, 1), (6, 96, 1), (6, 96, 1),
    (6, 160, 2), (6, 160, 1),
]


def mobilenet_walk(px=2048, folded_tail=True):
    w = Walk(f"FPN-MobileNet@{px}")
    hw = px // 2
    # features_0: conv3x3 s2 3->32 + BN(train stats) + relu6
    w.op("features_0 conv3x3s2 3->32", hw_in=px, cin=3, hw_out=hw, cout=32,
         k=3, norm_reads=1)
    cin = 32
    for i, (t, c, s) in enumerate(MNV2, start=1):
        hid = cin * t
        if t != 1:
            w.op(f"f{i} pw {cin}->{hid} @{hw}", hw_in=hw, cin=cin, hw_out=hw,
                 cout=hid, norm_reads=1)
        hw_o = hw // s
        w.op(f"f{i} dw3x3 s{s} x{hid} @{hw}", hw_in=hw, cin=hid, hw_out=hw_o,
             cout=hid, k=3, dw=True, norm_reads=1)
        w.op(f"f{i} pw {hid}->{c} @{hw_o}", hw_in=hw_o, cin=hid, hw_out=hw_o,
             cout=c, norm_reads=1)
        if s == 1 and cin == c:
            w.op(f"f{i} residual add @{hw_o}", hw_in=hw_o, cin=c, hw_out=hw_o,
                 cout=c, elementwise=True)
        cin, hw = c, hw_o
    # FPN taps: enc0@px/2 x16, enc1@px/4 x24, enc2@px/8 x32,
    # enc3@px/16 x64, enc4@px/32 x160
    enc = {0: (px // 2, 16), 1: (px // 4, 24), 2: (px // 8, 32),
           3: (px // 16, 64), 4: (px // 32, 160)}
    for k_, (hwe, ce) in enc.items():
        co = 64 if k_ == 0 else 128
        w.op(f"lateral{k_} pw {ce}->{co} @{hwe}", hw_in=hwe, cin=ce,
             hw_out=hwe, cout=co)
    for j, hwt in ((1, px // 16), (2, px // 8), (3, px // 4)):
        w.op(f"td{j} up2-add @{hwt}", hw_in=hwt // 2, cin=128, hw_out=hwt,
             cout=128, elementwise=True)
        w.op(f"td{j} conv3x3 128->128 @{hwt}", hw_in=hwt, cin=128,
             hw_out=hwt, cout=128, k=3, norm_reads=1)
    for j, hwh in ((4, px // 32), (3, px // 16), (2, px // 8), (1, px // 4)):
        w.op(f"head{j} conv3x3 128->64 @{hwh}", hw_in=hwh, cin=128,
             hw_out=hwh, cout=64, k=3)
        w.op(f"head{j} conv3x3 64->64 @{hwh}", hw_in=hwh, cin=64,
             hw_out=hwh, cout=64, k=3)
        if j > 1:  # nearest-upsample to px/4
            w.op(f"head{j} up x{2 ** (j - 1)} write @{px // 4}", hw_in=hwh,
                 cin=64, hw_out=px // 4, cout=64, elementwise=True)
    w.op("smooth conv3x3 256->64 @px/4", hw_in=px // 4, cin=256,
         hw_out=px // 4, cout=64, k=3, norm_reads=1)
    w.op("smooth up2 @px/2", hw_in=px // 4, cin=64, hw_out=px // 2, cout=64,
         elementwise=True)
    w.op("smooth2 add-lat0 conv3x3 64->32 @px/2", hw_in=px // 2, cin=64 + 64,
         hw_out=px // 2, cout=32, k=3, norm_reads=1)
    if folded_tail:
        # fold.py: phase conv 32->12 @px/2, skip read in phase layout,
        # one d2s write at px x3
        w.op("tail folded conv3x3 32->12 @px/2", hw_in=px // 2, cin=32,
             hw_out=px // 2, cout=12, k=3)
        w.op("tail skip+tanh+clip @px/2 x12", hw_in=px // 2, cin=12,
             hw_out=px // 2, cout=12, elementwise=True)
        w.op("tail d2s write @px x3", hw_in=px // 2, cin=12, hw_out=px,
             cout=3, elementwise=True)
    else:
        w.op("tail up2 @px x32", hw_in=px // 2, cin=32, hw_out=px, cout=32,
             elementwise=True)
        w.op("tail conv3x3 32->3 @px", hw_in=px, cin=32, hw_out=px, cout=3, k=3)
        w.op("tail skip+tanh+clip @px x3", hw_in=px, cin=3, hw_out=px, cout=3,
             elementwise=True)
    return w


def main():
    out = {"constants": {
        "hbm_gbps": HBM_GBPS,
        "mxu_tflops": MXU_FLOPS / 1e12,
        "vpu_fma_gelem_s": VPU_FMA_S / 1e9,
        "dtype_bytes": DSIZE,
    }, "models": {}}
    meas = {}
    rl = os.path.join(HERE, "results_large.json")
    if os.path.exists(rl):
        meas = json.load(open(rl))["results"]
    est = {}
    ae = os.path.join(HERE, "a100_estimates.json")
    if os.path.exists(ae):
        est = json.load(open(ae))["results"]

    for px, fold in ((2048, False), (2048, True)):
        w = mobilenet_walk(px, folded_tail=fold)
        pad, ideal = w.totals()
        key = f"FPN-MobileNet@{px}" + (" folded" if fold else " unfused")
        mrow = meas.get("DeblurGANv2-MobileNet@2048 serving", {})
        a100 = est.get("DeblurGANv2-MobileNet@2048", {}).get(
            "a100_device_mpix_per_s")
        entry = {
            "floor_ms_padded_layout": round(pad, 2),
            "floor_ms_ideal_layout": round(ideal, 2),
            "floor_mpix_s_padded": round(px * px / pad / 1e3, 1),
            "floor_mpix_s_ideal": round(px * px / ideal / 1e3, 1),
            "measured_ms": mrow.get("ms_per_forward"),
            "a100_device_mpix_per_s": a100,
            "top_ops": w.top(10),
        }
        out["models"][key] = entry
        print(f"{key}: floor padded {pad:.1f} ms "
              f"({px * px / pad / 1e3:.0f} Mpix/s) / ideal {ideal:.1f} ms "
              f"({px * px / ideal / 1e3:.0f} Mpix/s); "
              f"measured {mrow.get('ms_per_forward')} ms", flush=True)
        for o in w.top(8):
            print(f"   {o['name']:44s} {o['bound']:3s} "
                  f"pad {o['hbm_ms_padded']:7.3f}  ideal {o['hbm_ms_ideal']:7.3f} "
                  f"mxu {o['mxu_ms']:6.3f}  vpu {o['vpu_ms']:6.3f}")

    with open(os.path.join(HERE, "roofline_mobilenet.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("written benchmarks/roofline_mobilenet.json")


if __name__ == "__main__":
    main()
