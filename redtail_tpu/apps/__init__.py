"""Command-line applications: the `nvstereo_sample_app` and node-launcher
equivalents (reference: `stereoDNN/sample_app/main.cpp` CLI,
`ros/packages/*/launch/*.launch` composition)."""
