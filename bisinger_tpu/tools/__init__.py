"""Offline corpus-adaptation tooling (reference `/root/reference/utils/`):
M4Singer meta conversion to the CMU phone set, corpus merging with
speechsing tags, and pitch-shift pseudo-singing augmentation."""
