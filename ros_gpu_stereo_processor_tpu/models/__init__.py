"""Pipeline / model layer: the frame-graph engine and SLAM models."""
