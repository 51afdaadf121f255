#!/bin/bash
# Build the reference deFuse C++ tools against ordered-container shims to
# generate deterministic golden outputs for parity tests.  The resulting
# binaries land in ref_build/bin/ (gitignored).  Reference sources are
# compiled verbatim from /root/reference (read-only).
set -euo pipefail

REF=/root/reference/tools
HERE="$(cd "$(dirname "$0")" && pwd)"
BIN="$HERE/bin"
OBJ="$HERE/obj"
mkdir -p "$BIN" "$OBJ"

CXX=g++
CXXFLAGS="-O2 -g -DDEBUG_CHECKS -I$HERE/shim -I$REF -I/root/reference/include -I/root/reference/external/samtools-0.1.8 -I/root/reference/external/zlib-1.2.5 -std=c++14 -Wno-deprecated-declarations -include cmath -include algorithm -include cstring -include cstdlib"

compile() {
    local src="$1"
    local obj="$OBJ/$(basename "${src%.*}").o"
    if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
        echo "CXX $(basename "$src")" >&2
        $CXX $CXXFLAGS -c "$src" -o "$obj"
    fi
    echo "$obj"
}

# --- samtools faidx + zlib (needed by dosplitalign/evalsplitalign) -------
build_bam() {
    local ZDIR=/root/reference/external/zlib-1.2.5
    local BAMDIR=/root/reference/external/samtools-0.1.8
    local CFLAGS="-O2 -g -fcommon -Wno-implicit-function-declaration -Wno-implicit-int -I$ZDIR -I$BAMDIR"
    for c in "$ZDIR"/*.c; do
        local o="$OBJ/z_$(basename "${c%.*}").o"
        [ -f "$o" ] || { echo "CC  zlib/$(basename "$c")"; gcc $CFLAGS -c "$c" -o "$o"; }
    done
    for base in faidx razf bgzf knetfile; do
        local c="$BAMDIR/$base.c"
        local o="$OBJ/bam_$base.o"
        [ -f "$o" ] || { echo "CC  samtools/$base.c"; gcc $CFLAGS -D_USE_KNETFILE -c "$c" -o "$o"; }
    done
}

link() {
    local out="$BIN/$1"; shift
    echo "LD  $(basename "$out")"
    $CXX -O2 -g -o "$out" "$@"
}

OBJS_COMMON="$(compile $REF/Common.cpp) $(compile $REF/DebugCheck.cpp)"

# clustermatepairs
link clustermatepairs \
    $(compile $REF/AlignmentStream.cpp) \
    $(compile $REF/MatePairEM.cpp) \
    $(compile $REF/asa136.C) \
    $(compile $REF/asa241.C) \
    $(compile $REF/clustermatepairs.cpp) \
    $OBJS_COMMON

# setcover
link setcover \
    $(compile $REF/Parsers.cpp) \
    $(compile $REF/setcover.cpp) \
    $OBJS_COMMON

# localalign
link localalign \
    $(compile $REF/SimpleAligner.cpp) \
    $(compile $REF/localalign.cpp) \
    $OBJS_COMMON

# calccov
link calccov \
    $(compile $REF/AlignmentStream.cpp) \
    $(compile $REF/ExonRegions.cpp) \
    $(compile $REF/calccov.cpp) \
    $OBJS_COMMON

# estislands
link estislands \
    $(compile $REF/EstCatalog.cpp) \
    $(compile $REF/estislands.cpp)

# dosplitalign / evalsplitalign (need faidx)
build_bam
ZOBJS="$OBJ"/z_*.o
BAMOBJS="$OBJ"/bam_*.o
SPLIT_OBJS="$(compile $REF/AlignmentStream.cpp) $(compile $REF/FastaIndex.cpp) \
    $(compile $REF/ExonRegions.cpp) $(compile $REF/ReadIndex.cpp) \
    $(compile $REF/SplitAlignment.cpp) $(compile $REF/SplitReadAligner.cpp) \
    $(compile $REF/Parsers.cpp) $(compile $REF/ReadStream.cpp)"

link dosplitalign $(compile $REF/dosplitalign.cpp) $SPLIT_OBJS $OBJS_COMMON $BAMOBJS $ZOBJS
link evalsplitalign $(compile $REF/evalsplitalign.cpp) $SPLIT_OBJS $OBJS_COMMON $BAMOBJS $ZOBJS
link splitseq $(compile $REF/splitseq.cpp) $(compile $REF/PathFinder.cpp) $SPLIT_OBJS $OBJS_COMMON $BAMOBJS $ZOBJS



# bamfastq (BamTools needs -std=c++11; accumulators headers are stubbed)
build_bamtools() {
    local BT=/root/reference/external/BamTools-2.0
    local BTO="$OBJ/bamtools"
    mkdir -p "$BTO"
    for f in "$BT"/api/*.cpp "$BT"/api/internal/*/*.cpp; do
        local o="$BTO/$(echo "$f" | md5sum | cut -c1-10).o"
        [ -f "$o" ] || { echo "CC  bamtools/$(basename "$f")" >&2; \
            g++ -std=c++11 -O2 -c "$f" -I"$BT" -I"$BT/api" \
            -I/root/reference/external/zlib-1.2.5 -o "$o"; }
    done
}
build_bamtools
BFOBJ="$OBJ/bamfastq.o"
[ -f "$BFOBJ" ] || g++ -std=c++11 $CXXFLAGS -I/root/reference/external/BamTools-2.0 -I/root/reference/external/BamTools-2.0/api $REF/bamfastq.cpp -c -o "$BFOBJ"
link bamfastq "$BFOBJ" $OBJS_COMMON "$OBJ"/bamtools/*.o $ZOBJS
echo "OK: binaries in $BIN"

link matealign $(compile $REF/matealign.cpp) $(compile $REF/Sequences.cpp) \
    $(compile $REF/ReadStream.cpp) $(compile $REF/SimpleAligner.cpp) $OBJS_COMMON
