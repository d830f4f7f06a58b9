"""Minimal client for the pesto_tpu batching inference server.

Start the server first:

    python -m pesto_tpu.serve --ckpt /path/to/model.pt --port 8490

then point this client at one or more PDB/mmCIF files — requests go out
concurrently so the server's batcher can merge them into one device
dispatch:

    python examples/serving_client.py 1H9D.pdb 1ACB.pdb --port 8490
"""

import argparse
import http.client
import json
import sys
from concurrent.futures import ThreadPoolExecutor


def predict(host, port, path):
    conn = http.client.HTTPConnection(host, port, timeout=600)
    with open(path, "rb") as f:
        body = f.read()
    headers = {"Content-Type": "chemical/x-cif"} if ".cif" in path else {}
    conn.request("POST", "/v1/predict", body=body, headers=headers)
    r = conn.getresponse()
    data = r.read()
    conn.close()
    if r.status != 200:
        return path, None, f"HTTP {r.status}: {data.decode()[:200]}"
    return path, json.loads(data), None


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8490)
    args = ap.parse_args()

    with ThreadPoolExecutor(len(args.inputs)) as pool:
        futures = [
            pool.submit(predict, args.host, args.port, p) for p in args.inputs
        ]
        for fut in futures:
            path, out, err = fut.result()
            if err:
                print(f"{path}: {err}", file=sys.stderr)
                continue
            peak = max(max(row) for row in out["probabilities"])
            print(f"{path}: {out['residues']} residues x {out['classes']} "
                  f"classes, peak p={peak:.3f}")

    # server-side batching evidence
    conn = http.client.HTTPConnection(args.host, args.port, timeout=60)
    conn.request("GET", "/v1/stats")
    print("server stats:", conn.getresponse().read().decode())
    conn.close()


if __name__ == "__main__":
    main()
