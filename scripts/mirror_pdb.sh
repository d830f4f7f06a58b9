#!/bin/sh
# Mirror the RCSB biounit archive from the EBI rsync server into
# all_biounits/ (the dataset builder's expected input layout; equivalent
# of the reference's data mirror step). Requires network access.
set -eu

MIRRORDIR="${1:-all_biounits}"
LOGFILE="${2:-pdb_mirror.log}"
SERVER="rsync.ebi.ac.uk::pub/databases/rcsb/pdb-remediated"
FTPPATH="/data/biounit/PDB/divided/"

exec rsync -rlpt -v -z --delete --port=873 "${SERVER}${FTPPATH}" "$MIRRORDIR" >"$LOGFILE" 2>&1
