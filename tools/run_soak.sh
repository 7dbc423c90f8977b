#!/usr/bin/env bash
# Health-gated long-soak launcher for tunneled TPU dev hardware.
#
# TPU-tunnel outages BLOCK device calls rather than failing them
# (docs/faq.md), so a soak started mid-outage burns its whole warm-up grace
# producing nothing and FAILs spuriously. This wrapper (a) waits until a
# trivial device call completes twice in a row (probes run in subprocesses —
# an in-process blocked call would poison this shell's python), then
# (b) sizes the soak to the remaining wall-clock budget and runs it with the
# r3 soak protocol env (RTP_TPU_MIN_DISPATCH_INTERVAL=1.0; the shipped
# samples-dispatch layout + view kernel are defaults).
#
# Usage: run_soak.sh <end_epoch_seconds> <logfile>
#   end_epoch_seconds: absolute unix time the soak must END by
#   logfile: appended to (probe progress + the soak's own output)
set -u
END_EPOCH="${1:?end epoch}"
LOG="${2:?logfile}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

probe() {
  timeout 90 python -c "import jax, jax.numpy as jnp; x=jnp.ones((8,128)); print(float((x@x.T).sum()))" >/dev/null 2>&1
}

echo "run_soak: waiting for device health (end_epoch=$END_EPOCH)" >>"$LOG"
until probe; do
  NOW=$(date +%s)
  if [ "$NOW" -ge "$END_EPOCH" ]; then
    echo "run_soak: budget exhausted before device became healthy" >>"$LOG"
    exit 2
  fi
  echo "run_soak: probe failed at $(date -u +%H:%M:%S); retrying" >>"$LOG"
  sleep 120
done
sleep 30
until probe; do sleep 120; done  # outages flap: require two healthy probes

# The tunnel FLAPS (docs/faq.md): a soak can pass the probe, then stall in
# warm-up and fail its grace without ever producing a frame. Such a failure
# is environmental, not evidence — retry (re-probing first) as long as
# budget remains. A failure AFTER frames flowed is real and is kept.
while :; do
  NOW=$(date +%s)
  DUR=$((END_EPOCH - NOW))
  if [ "$DUR" -lt 1800 ]; then DUR=1800; fi
  ATTEMPT_MARK=$(wc -l <"$LOG")
  echo "run_soak: device healthy at $(date -u +%H:%M:%S); soaking ${DUR}s" >>"$LOG"
  env RTP_TPU_MIN_DISPATCH_INTERVAL=1.0 SOAK_GRACE_SECONDS=1800 \
    python examples/soak.py "$DUR" >>"$LOG" 2>&1
  RC=$?
  [ "$RC" -eq 0 ] && exit 0
  if tail -n +"$ATTEMPT_MARK" "$LOG" | grep -q "recent_frames=[1-9]"; then
    echo "run_soak: soak failed AFTER producing frames (rc=$RC) — real" >>"$LOG"
    exit "$RC"
  fi
  NOW=$(date +%s)
  if [ $((END_EPOCH - NOW)) -lt 2400 ]; then
    echo "run_soak: warm-up failure and budget exhausted (rc=$RC)" >>"$LOG"
    exit "$RC"
  fi
  echo "run_soak: warm-up-phase failure (rc=$RC, no frames) — environmental; re-probing" >>"$LOG"
  until probe; do sleep 120; done
  sleep 30
  until probe; do sleep 120; done
done
