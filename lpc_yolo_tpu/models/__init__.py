"""Non-YOLO model families (reference ultralytics/models/)."""
