// Minimal stub satisfying line2Dup.h's Timer usage (the reference's
// csv-parser submodule is absent from the mount). Only the tiny surface the
// header touches is provided; golden generation never calls it.
#pragma once
#include <sstream>
#include <string>
#include <vector>

namespace csv {
namespace internals {
template <typename T>
inline std::string to_string(const T& v) {
    std::ostringstream ss;
    ss << v;
    return ss.str();
}
}  // namespace internals

struct StubWriter {
    std::ostream& os;
    template <typename Row>
    StubWriter& operator<<(const Row& row) {
        bool first = true;
        for (const auto& v : row) {
            if (!first) os << ",";
            os << v;
            first = false;
        }
        os << "\n";
        return *this;
    }
};

inline StubWriter make_csv_writer(std::ostream& os) { return StubWriter{os}; }
}  // namespace csv
