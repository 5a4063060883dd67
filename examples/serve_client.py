#!/usr/bin/env python3
"""Minimal client for the synthesis service.

Usage:
    python examples/serve_client.py <ncct_slice.dcm> [--host 127.0.0.1:8080]

POSTs the DICOM slice to /synthesize and writes the synthetic-CTA response
next to the input as ``<name>.synth.dcm``; prints the service health stats.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dicom", help="NCCT DICOM slice to synthesize from")
    ap.add_argument("--host", default="127.0.0.1:8080")
    args = ap.parse_args()

    with urllib.request.urlopen(f"http://{args.host}/healthz") as r:
        print("service:", json.loads(r.read()))

    with open(args.dicom, "rb") as f:
        body = f.read()
    req = urllib.request.Request(
        f"http://{args.host}/synthesize", data=body, method="POST"
    )
    with urllib.request.urlopen(req) as r:
        out = r.read()
    out_path = args.dicom + ".synth.dcm"
    with open(out_path, "wb") as f:
        f.write(out)

    from ctagan_tpu.data.dicom import read_dicom

    ds = read_dicom(out_path)
    print(
        f"synthetic CTA -> {out_path} "
        f"({ds.rows}x{ds.cols}, series {ds.series_instance_uid[:24]}...)"
    )


if __name__ == "__main__":
    main()
