"""Command-line tools mirroring the reference binaries (src/bin/):

  cfelics — compress an image file to .fel        (cfelics.rs)
  dfelics — decompress a .fel to an image file    (dfelics.rs)
  vfelics — view a .fel file                      (vfelics.rs)
  bfelics — corpus benchmark driver               (bench/benchmark-small-corpus.py)
"""
