// Differential-test shim: compiles the ORIGINAL reference CONSENT
// translation units (read in place from /root/reference/src via -I;
// nothing is copied into this repo) behind a small C ABI, so the test
// suite can fuzz-diff our reimplementation against the real compiled
// code stage by stage (VERDICT round 1, item 2).
//
// Units linked (all compile standalone — only robin_hood.h needed):
//   alignmentWindows.cpp  getCoverages / getAlignmentWindowsPositions /
//                         getAlignmentWindowsSequences
//   alignmentPiles.cpp    getNextReadPile
//   utils.cpp             trimRead / dropRead / splitRead / fullstr2num
//   reverseComplement.cpp rev_comp::run
//
// Build (tests/test_reference_diff.py does this on the fly):
//   g++ -std=c++11 -O3 -fPIC -shared -I $REF/src shim.cpp \
//       $REF/src/{alignmentWindows,alignmentPiles,utils,reverseComplement}.cpp \
//       -o ref_shim.so

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "alignmentPiles.h"
#include "alignmentWindows.h"
#include "reverseComplement.h"
#include "utils.h"

namespace {

// serialize a list of strings '\n'-joined into out; returns byte count
// or -1 if cap too small
int64_t pack_strings(const std::vector<std::string>& v, char* out,
                     int64_t cap) {
    int64_t n = 0;
    for (const auto& s : v) n += (int64_t)s.size() + 1;
    if (n > cap) return -1;
    char* p = out;
    for (const auto& s : v) {
        memcpy(p, s.data(), s.size());
        p += s.size();
        *p++ = '\n';
    }
    return n;
}

std::vector<Overlap> make_overlaps(
    int n_ov, const uint32_t* qLength, const uint32_t* qStart,
    const uint32_t* qEnd, const uint8_t* strand, const uint32_t* tLength,
    const uint32_t* tStart, const uint32_t* tEnd, const int32_t* tNameIdx,
    const char* qname, const char* const* names) {
    std::vector<Overlap> als(n_ov);
    for (int i = 0; i < n_ov; i++) {
        als[i].qName = qname;
        als[i].qLength = qLength[i];
        als[i].qStart = qStart[i];
        als[i].qEnd = qEnd[i];  // inclusive, as Overlap stores it
        als[i].strand = strand[i] != 0;
        als[i].tName = names && tNameIdx ? names[tNameIdx[i]] : "t";
        als[i].tLength = tLength[i];
        als[i].tStart = tStart[i];
        als[i].tEnd = tEnd[i];
        als[i].resMatches = 0;
        als[i].alBlockLen = 1;
        als[i].mapQual = 60;
    }
    return als;
}

}  // namespace

extern "C" {

// ---- window positions (alignmentWindows.cpp:27-85) ----
int64_t ref_window_positions(
    uint32_t tplLen, int n_ov, const uint32_t* qStart,
    const uint32_t* qEnd, uint32_t minSupport, uint32_t maxSupport,
    uint32_t windowSize, int32_t windowOverlap, uint32_t* out,
    int64_t cap) {
    std::vector<uint32_t> qlen(n_ov, tplLen), tlen(n_ov, 1),
        tstart(n_ov, 0), tend(n_ov, 0);
    std::vector<uint8_t> strand(n_ov, 0);
    auto als = make_overlaps(n_ov, qlen.data(), qStart, qEnd,
                             strand.data(), tlen.data(), tstart.data(),
                             tend.data(), nullptr, "q", nullptr);
    auto pos = getAlignmentWindowsPositions(tplLen, als, minSupport,
                                            maxSupport, windowSize,
                                            windowOverlap);
    if ((int64_t)pos.size() * 2 > cap) return -1;
    for (size_t i = 0; i < pos.size(); i++) {
        out[2 * i] = pos[i].first;
        out[2 * i + 1] = pos[i].second;
    }
    return (int64_t)pos.size();
}

// ---- fragment clipping (alignmentWindows.cpp:87-149) ----
int64_t ref_window_sequences(
    int n_ov, const uint32_t* qLength, const uint32_t* qStart,
    const uint32_t* qEnd, const uint8_t* strand, const uint32_t* tLength,
    const uint32_t* tStart, const uint32_t* tEnd, const int32_t* tNameIdx,
    int n_seqs, const char* const* names, const char* const* seqs,
    const char* qname, uint32_t qBeg, uint32_t end, uint32_t merSize,
    char* out, int64_t cap) {
    auto als = make_overlaps(n_ov, qLength, qStart, qEnd, strand, tLength,
                             tStart, tEnd, tNameIdx, qname, names);
    robin_hood::unordered_map<std::string, std::string> sequences;
    sequences[qname] = seqs[n_seqs - 1];  // caller passes template last
    for (int i = 0; i < n_seqs - 1; i++) sequences[names[i]] = seqs[i];
    auto pile = getAlignmentWindowsSequences(
        als, /*minSupport*/ 2, /*windowSize*/ end - qBeg + 1,
        /*windowOverlap*/ 0, sequences, qBeg, end, merSize,
        /*maxSupport*/ 10000, /*commonKMers*/ 8);
    return pack_strings(pile, out, cap);
}

// ---- pile streaming (alignmentPiles.cpp:22-58) ----
// Serializes each pile as "qName<TAB>tName<TAB>qStart<TAB>qEnd<TAB>..."
// lines with a '#' line between piles.
int64_t ref_read_piles(const char* paf_path, uint32_t maxSupport,
                       char* out, int64_t cap) {
    std::ifstream f(paf_path);
    std::vector<std::string> lines;
    while (true) {
        auto pile = getNextReadPile(f, maxSupport);
        if (pile.empty()) break;
        for (const auto& al : pile) {
            lines.push_back(al.qName + "\t" + al.tName + "\t" +
                            std::to_string(al.qStart) + "\t" +
                            std::to_string(al.qEnd) + "\t" +
                            std::to_string(al.tStart) + "\t" +
                            std::to_string(al.tEnd) + "\t" +
                            std::to_string(al.resMatches) + "\t" +
                            std::to_string((int)al.strand));
        }
        lines.push_back("#");
    }
    return pack_strings(lines, out, cap);
}

// ---- utils.cpp ----
int64_t ref_trim_read(const char* s, uint32_t merSize, char* out,
                      int64_t cap) {
    std::string r = trimRead(s, merSize);
    if ((int64_t)r.size() + 1 > cap) return -1;
    memcpy(out, r.data(), r.size());
    return (int64_t)r.size();
}

int32_t ref_drop_read(const char* s) { return dropRead(s) ? 1 : 0; }

int64_t ref_split_read(const char* name, const char* s, int n_pos,
                       const uint32_t* pbeg, const uint32_t* pend,
                       uint32_t windowSize, uint32_t windowOverlap,
                       char* out, int64_t cap) {
    std::vector<std::pair<unsigned, unsigned>> pos(n_pos);
    for (int i = 0; i < n_pos; i++) pos[i] = {pbeg[i], pend[i]};
    auto parts = splitRead(name, s, pos, windowSize, windowOverlap);
    return pack_strings(parts, out, cap);
}

int64_t ref_revcomp(const char* s, char* out, int64_t cap) {
    std::string r = rev_comp::run(s);
    if ((int64_t)r.size() + 1 > cap) return -1;
    memcpy(out, r.data(), r.size());
    return (int64_t)r.size();
}

// 2-bit pack + unpack round trip (utils.cpp fullstr2num/fullnum2str)
int64_t ref_pack_roundtrip(const char* s, char* out, int64_t cap) {
    std::string r = fullnum2str(fullstr2num(s));
    if ((int64_t)r.size() + 1 > cap) return -1;
    memcpy(out, r.data(), r.size());
    return (int64_t)r.size();
}

}  // extern "C"
