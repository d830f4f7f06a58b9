// Native PDB parser: the hot host-side path of the data loader.
//
// Replaces the per-line Python parsing in io/pdb.py (semantics matched:
// fixed columns, first-altloc kept keyed by model_chain_resid_icode_name
// — PER MODEL, so NMR ensembles keep their altloc atoms in every model;
// the reference's global key silently drops them for models >= 2 —
// multi-model "{chain}:{model}" naming, element fallback guess). The
// reference relied on GEMMI (C++) for this; this is our equivalent
// native component. Supports plain and gzip files (zlib).
//
// C API (ctypes-friendly, two-phase):
//   void* pdb_parse(const char* path)      -> handle or NULL
//   int   pdb_natoms(void* h)
//   void  pdb_fill(void* h, float* xyz, int* resid, ..., float* bfactor,
//                  char* name16, char* element4, char* resname8,
//                  char* het1, char* chain16, char* icode4)
//   void  pdb_free(void* h)
//   const char* pdb_error()                -> last error message

#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <set>
#include <unordered_set>
#include <vector>

#include <zlib.h>

namespace {

struct Atom {
    float x, y, z, bfactor;
    int32_t resid;
    char name[16];
    char element[4];
    char resname[8];
    char het;
    char chain[16];
    char icode[4];
};

struct ParseResult {
    std::vector<Atom> atoms;
};

thread_local std::string g_error;

inline std::string strip(const char* s, int len) {
    int a = 0, b = len;
    while (a < b && std::isspace(static_cast<unsigned char>(s[a]))) a++;
    while (b > a && (s[b - 1] == '\0' || std::isspace(static_cast<unsigned char>(s[b - 1])))) b--;
    return std::string(s + a, b - a);
}

const std::unordered_set<std::string> kTwoLetter = {
    "BR","CL","ZN","MG","FE","CA","NA","MN","CU","NI","CO","SE","CD","HG",
    "PT","PB","AU","AG","SR","BA","RB","CS","LI","AL","SI","AS","MO","RU",
    "RH","PD","SN","SB","TE","XE","GD","IR","OS","RE","TL","BI"};

std::string normalize_element(const std::string& raw) {
    std::string e;
    for (char c : raw)
        if (std::isalpha(static_cast<unsigned char>(c))) e += c;
    if (e.empty()) return "";
    if (e.size() == 1) return std::string(1, std::toupper(e[0]));
    std::string out(1, std::toupper(e[0]));
    for (size_t i = 1; i < e.size(); i++) out += std::tolower(e[i]);
    return out;
}

// mirrors pesto_tpu/io/pdb.py _guess_element: standard biopolymer/water
// residues contain only C/H/N/O/S/P (an HG there is a gamma-hydrogen,
// never mercury); elsewhere common organic-position prefixes are metals
// only when the residue IS the ion
static const std::set<std::string> kStdBioResnames = {
    "ALA", "ARG", "ASN", "ASP", "CYS", "GLN", "GLU", "GLY", "HIS", "ILE",
    "LEU", "LYS", "MET", "PHE", "PRO", "SER", "THR", "TRP", "TYR", "VAL",
    "MSE", "SEC", "PYL",
    "DA", "DC", "DG", "DT", "DI", "A", "C", "G", "U", "I",
    "HOH", "DOD",
};
static const std::set<std::string> kAmbiguousTwoLetter = {
    "CA", "CD", "NE", "CE", "NA", "NB", "ND", "HG", "HE", "HD", "CS",
};

std::string guess_element(const std::string& name, const std::string& resname) {
    std::string s;
    for (char c : name)
        if (std::isalpha(static_cast<unsigned char>(c))) s += std::toupper(c);
    if (s.empty()) return "X";
    std::string rn;
    for (char c : resname)
        if (!std::isspace(static_cast<unsigned char>(c))) rn += std::toupper(c);
    if (kStdBioResnames.count(rn)) return std::string(1, s[0]);
    if (s.size() >= 2) {
        std::string two = s.substr(0, 2);
        if (kTwoLetter.count(two)) {
            if (rn == two || !kAmbiguousTwoLetter.count(two))
                return std::string(1, two[0]) + static_cast<char>(std::tolower(two[1]));
        }
    }
    return std::string(1, s[0]);
}

bool parse_float(const char* s, int len, float* out) {
    char buf[32];
    int n = len < 31 ? len : 31;
    std::memcpy(buf, s, n);
    buf[n] = '\0';
    char* end = nullptr;
    *out = std::strtof(buf, &end);
    while (end && *end && std::isspace(static_cast<unsigned char>(*end))) end++;
    return end != buf;
}

}  // namespace

extern "C" {

void* pdb_parse(const char* path) {
    gzFile f = gzopen(path, "rb");
    if (!f) {
        g_error = std::string("cannot open ") + path;
        return nullptr;
    }
    auto* res = new ParseResult();
    res->atoms.reserve(4096);

    std::unordered_set<std::string> altloc_seen;
    int mid = 0;
    bool saw_model = false;
    char line[512];

    while (gzgets(f, line, sizeof(line))) {
        size_t len = std::strlen(line);
        while (len && (line[len - 1] == '\n' || line[len - 1] == '\r')) line[--len] = '\0';
        if (len < 6) continue;
        if (std::strncmp(line, "MODEL ", 6) == 0) {
            if (saw_model) mid++;
            saw_model = true;
            continue;
        }
        bool is_atom = std::strncmp(line, "ATOM  ", 6) == 0;
        bool is_het = std::strncmp(line, "HETATM", 6) == 0;
        if (!is_atom && !is_het) continue;
        if (len < 54) continue;

        std::string name = strip(line + 12, 4);
        char altloc = line[16];
        std::string resname = strip(line + 17, 3);
        std::string chain = strip(line + 21, 1);
        char* end = nullptr;
        char residbuf[5] = {line[22], line[23], line[24], line[25], '\0'};
        long resid = std::strtol(residbuf, &end, 10);
        if (end == residbuf) continue;
        std::string icode = strip(line + 26, 1);

        if (altloc != ' ' && altloc != '\0') {
            std::string key = std::to_string(mid) + "_" + chain + "_" +
                              std::to_string(resid) + "_" + icode + "_" + name;
            if (!altloc_seen.insert(key).second) continue;
        }

        float x, y, z;
        if (!parse_float(line + 30, 8, &x) || !parse_float(line + 38, 8, &y) ||
            !parse_float(line + 46, 8, &z))
            continue;

        float bfactor = 0.0f;
        if (len >= 66) parse_float(line + 60, 6, &bfactor);

        std::string element;
        if (len >= 78) element = normalize_element(strip(line + 76, 2));
        else if (len > 76) element = normalize_element(strip(line + 76, len - 76));
        if (element.empty()) element = guess_element(name, resname);

        Atom a{};
        a.x = x; a.y = y; a.z = z; a.bfactor = bfactor;
        a.resid = static_cast<int32_t>(resid);
        std::snprintf(a.name, sizeof(a.name), "%s", name.c_str());
        std::snprintf(a.element, sizeof(a.element), "%s", element.c_str());
        std::snprintf(a.resname, sizeof(a.resname), "%s", resname.c_str());
        a.het = is_atom ? 'A' : 'H';
        std::snprintf(a.chain, sizeof(a.chain), "%s:%d", chain.c_str(), mid);
        std::snprintf(a.icode, sizeof(a.icode), "%s", icode.c_str());
        res->atoms.push_back(a);
    }
    gzclose(f);

    if (res->atoms.empty()) {
        g_error = std::string("no atoms parsed from ") + path;
        delete res;
        return nullptr;
    }
    return res;
}

int pdb_natoms(void* h) { return static_cast<int>(static_cast<ParseResult*>(h)->atoms.size()); }

void pdb_fill(void* h, float* xyz, int32_t* resid, char* name16, char* element4,
              char* resname8, char* het1, char* chain16, char* icode4,
              float* bfactor) {
    auto* res = static_cast<ParseResult*>(h);
    const size_t n = res->atoms.size();
    for (size_t i = 0; i < n; i++) {
        const Atom& a = res->atoms[i];
        xyz[3 * i] = a.x;
        xyz[3 * i + 1] = a.y;
        xyz[3 * i + 2] = a.z;
        resid[i] = a.resid;
        std::memcpy(name16 + 16 * i, a.name, 16);
        std::memcpy(element4 + 4 * i, a.element, 4);
        std::memcpy(resname8 + 8 * i, a.resname, 8);
        het1[i] = a.het;
        std::memcpy(chain16 + 16 * i, a.chain, 16);
        std::memcpy(icode4 + 4 * i, a.icode, 4);
        bfactor[i] = a.bfactor;
    }
}

void pdb_free(void* h) { delete static_cast<ParseResult*>(h); }

const char* pdb_error() { return g_error.c_str(); }

}  // extern "C"
