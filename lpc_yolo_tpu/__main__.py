"""`python -m lpc_yolo_tpu ...` == the `yolo` CLI."""

from .cfg import entrypoint

if __name__ == "__main__":
    entrypoint()
