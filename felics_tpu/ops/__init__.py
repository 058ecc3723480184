"""Parallel encoder building blocks (XLA/Pallas).

The reference's hot loop (src/compression.rs:117-146) is a serial raster scan
into a serial bit writer. Here it is decomposed into data-parallel passes:

  analysis   per-pixel context/class/residual — embarrassingly parallel
             (the encoder knows all pixels up front).
  kscan      bit-exact evolution of the adaptive k tables — the only
             sequential dependence, restructured as a rank-synchronous scan
             over per-context update queues (all contexts advance one update
             per step, in parallel).
  symbolize  per-pixel codeword materialization as (bits, length) symbols —
             embarrassingly parallel.
  bitpack    exclusive prefix-sum over code lengths + scatter of explicit
             bits + run-length diff/cumsum for unary one-runs + byte packing.
"""
