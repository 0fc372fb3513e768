"""Triton Inference Server client (KServe v2 REST, stdlib-only).

Behavioral spec: reference utils/triton.py (TritonRemoteModel): parse
<scheme>://<netloc>/<endpoint> urls, read the model config for input/output
names and dtypes, infer with numpy arrays in / numpy arrays out.

The reference depends on the tritonclient package; this environment has no
installable extras, so the HTTP path speaks Triton's open KServe-v2 REST
protocol directly with urllib (JSON header + little-endian binary tensor
payload). The gRPC scheme still requires tritonclient and raises the same
ImportError the reference would.
"""

from __future__ import annotations

import json
import struct
import urllib.request
from typing import List
from urllib.parse import urlsplit

import numpy as np

_DTYPES = {
    "FP32": np.float32,
    "FP16": np.float16,
    "UINT8": np.uint8,
    "INT8": np.int8,
    "INT32": np.int32,
    "INT64": np.int64,
    "BOOL": np.bool_,
}
_NP2TRITON = {v: k for k, v in _DTYPES.items()}


class TritonRemoteModel:
    """Remote model handle: `TritonRemoteModel('http://host:8000/yolov10n')`."""

    def __init__(self, url: str, endpoint: str = "", scheme: str = ""):
        if not endpoint and not scheme:
            splits = urlsplit(url)
            endpoint = splits.path.strip("/").split("/")[0]
            scheme = splits.scheme
            url = splits.netloc
        self.endpoint = endpoint
        self.url = url
        self.scheme = scheme or "http"
        if self.scheme == "grpc":
            import tritonclient.grpc  # noqa: F401 — same gate as the reference

            raise ImportError("gRPC path requires the tritonclient package")

        cfg = self._get_json(f"http://{self.url}/v2/models/{self.endpoint}/config")
        cfg["output"] = sorted(cfg["output"], key=lambda x: x.get("name"))
        self.input_formats = [x["data_type"].replace("TYPE_", "") for x in cfg["input"]]
        self.np_input_formats = [_DTYPES[f] for f in self.input_formats]
        self.input_names = [x["name"] for x in cfg["input"]]
        self.output_names = [x["name"] for x in cfg["output"]]

    @staticmethod
    def _get_json(url: str) -> dict:
        with urllib.request.urlopen(url, timeout=10) as r:
            return json.loads(r.read())

    def __call__(self, *inputs: np.ndarray) -> List[np.ndarray]:
        """KServe v2 binary-tensor inference round trip."""
        in_dtype = inputs[0].dtype
        metas, blobs = [], []
        for i, x in enumerate(inputs):
            x = np.ascontiguousarray(x.astype(self.np_input_formats[i]))
            blobs.append(x.tobytes())
            metas.append(
                {
                    "name": self.input_names[i],
                    "shape": list(x.shape),
                    "datatype": self.input_formats[i],
                    "parameters": {"binary_data_size": len(blobs[-1])},
                }
            )
        header = json.dumps(
            {
                "inputs": metas,
                "outputs": [
                    {"name": n, "parameters": {"binary_data": True}} for n in self.output_names
                ],
            }
        ).encode()
        body = header + b"".join(blobs)
        req = urllib.request.Request(
            f"http://{self.url}/v2/models/{self.endpoint}/infer",
            data=body,
            headers={
                "Content-Type": "application/octet-stream",
                "Inference-Header-Content-Length": str(len(header)),
            },
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            hlen = int(r.headers.get("Inference-Header-Content-Length", 0))
            payload = r.read()
        meta = json.loads(payload[:hlen]) if hlen else json.loads(payload)
        binary = payload[hlen:]
        outs = {}
        off = 0
        for o in meta["outputs"]:
            dt = _DTYPES[o["datatype"]]
            size = o.get("parameters", {}).get("binary_data_size")
            if size is not None:
                arr = np.frombuffer(binary[off : off + size], dtype=dt).reshape(o["shape"])
                off += size
            else:
                arr = np.array(o["data"], dtype=dt).reshape(o["shape"])
            outs[o["name"]] = arr
        return [outs[n].astype(in_dtype) for n in self.output_names]
