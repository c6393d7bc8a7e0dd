// Declarations header for compiling the reference's 16-orientation
// experiment (/root/reference/test/ori_16bit_experiment/
// line2Dup_16bit_ori.cpp) as golden-generation test infrastructure.
//
// The experiment ships with `#include "line2Dup.h"` but predates the
// fork's header (its addTemplate/selectScatteredFeatures signatures match
// the ORIGINAL upstream meiqua/shape_based_matching API, not the fork's
// /root/reference/line2Dup.h). This file declares exactly the entities the
// experiment .cpp defines or expects inline (Candidate ordering, Match
// ordering/equality, ColorGradient::process), derived by reading that .cpp
// — nothing here ships in the framework.
#ifndef SBM_ORI16_LINE2DUP_H
#define SBM_ORI16_LINE2DUP_H

#include <map>
#include <string>
#include <vector>

#include <opencv2/core/core.hpp>
#include <opencv2/imgproc.hpp>

namespace line2Dup
{

struct Feature
{
    int x;
    int y;
    int label;

    void read(const cv::FileNode &fn);
    void write(cv::FileStorage &fs) const;

    Feature() : x(0), y(0), label(0) {}
    Feature(int _x, int _y, int _label) : x(_x), y(_y), label(_label) {}
};

struct Template
{
    int width;
    int height;
    int tl_x;
    int tl_y;
    int pyramid_level;
    std::vector<Feature> features;

    void read(const cv::FileNode &fn);
    void write(cv::FileStorage &fs) const;
};

class ColorGradientPyramid
{
public:
    ColorGradientPyramid(const cv::Mat &src, const cv::Mat &mask,
                         float weak_threshold, size_t num_features,
                         float strong_threshold);

    void quantize(cv::Mat &dst) const;
    bool extractTemplate(Template &templ) const;
    void pyrDown();

public:  // the experiment tool reads intermediates directly
    void update();

    cv::Mat src;
    cv::Mat mask;

    int pyramid_level;
    cv::Mat angle;
    cv::Mat magnitude;

    float weak_threshold;
    size_t num_features;
    float strong_threshold;

    struct Candidate
    {
        Candidate(int x, int y, int label, float score);
        // sort candidates with high score to the front
        bool operator<(const Candidate &rhs) const
        {
            return score > rhs.score;
        }
        Feature f;
        float score;
    };

    // static member (callable from const extractTemplate), as upstream
    static bool selectScatteredFeatures(
        const std::vector<Candidate> &candidates,
        std::vector<Feature> &features,
        size_t num_features, float distance);
};

inline ColorGradientPyramid::Candidate::Candidate(int x, int y, int label,
                                                  float _score)
    : f(x, y, label), score(_score) {}

class ColorGradient
{
public:
    ColorGradient();
    ColorGradient(float weak_threshold, size_t num_features,
                  float strong_threshold);

    std::string name() const;

    void read(const cv::FileNode &fn);
    void write(cv::FileStorage &fs) const;

    float weak_threshold;
    size_t num_features;
    float strong_threshold;

    cv::Ptr<ColorGradientPyramid> process(const cv::Mat &src,
                                          const cv::Mat &mask = cv::Mat()) const
    {
        return cv::makePtr<ColorGradientPyramid>(src, mask, weak_threshold,
                                                 num_features,
                                                 strong_threshold);
    }
};

struct Match
{
    Match() {}
    Match(int _x, int _y, float _similarity, const std::string &_class_id,
          int _template_id)
        : x(_x), y(_y), similarity(_similarity), class_id(_class_id),
          template_id(_template_id) {}

    // sort by decreasing similarity, then template_id for stability
    bool operator<(const Match &rhs) const
    {
        if (similarity != rhs.similarity)
            return similarity > rhs.similarity;
        return template_id < rhs.template_id;
    }

    bool operator==(const Match &rhs) const
    {
        return x == rhs.x && y == rhs.y && similarity == rhs.similarity &&
               class_id == rhs.class_id;
    }

    int x;
    int y;
    float similarity;
    std::string class_id;
    int template_id;
};

class Detector
{
public:
    Detector();
    Detector(std::vector<int> T);
    Detector(int num_features, std::vector<int> T);

    std::vector<Match> match(cv::Mat source, float threshold,
                             const std::vector<std::string> &class_ids =
                                 std::vector<std::string>(),
                             const cv::Mat mask = cv::Mat()) const;

    int addTemplate(const cv::Mat source, const std::string &class_id,
                    const cv::Mat &object_mask, int num_features = 0);

    const cv::Ptr<ColorGradient> &getModalities() const { return modality; }

    int getT(int pyramid_level) const { return T_at_level[pyramid_level]; }
    int pyramidLevels() const { return pyramid_levels; }

    const std::vector<Template> &getTemplates(const std::string &class_id,
                                              int template_id) const;

    int numTemplates() const;
    int numTemplates(const std::string &class_id) const;
    int numClasses() const { return static_cast<int>(class_templates.size()); }

    std::vector<std::string> classIds() const;

    void read(const cv::FileNode &fn);
    void write(cv::FileStorage &fs) const;

    std::string readClass(const cv::FileNode &fn,
                          const std::string &class_id_override = "");
    void writeClass(const std::string &class_id, cv::FileStorage &fs) const;

    void readClasses(const std::vector<std::string> &class_ids,
                     const std::string &format = "templates_%s.yml.gz");
    void writeClasses(const std::string &format = "templates_%s.yml.gz") const;

public:  // the golden tool drives matchClass internals directly
    cv::Ptr<ColorGradient> modality;
    int pyramid_levels;
    std::vector<int> T_at_level;

    typedef std::vector<cv::Mat> LinearMemories;
    // Indexed as [pyramid level][ColorGradient][quantized label]
    typedef std::vector<std::vector<LinearMemories>> LinearMemoryPyramid;

    typedef std::vector<Template> TemplatePyramid;
    typedef std::map<std::string, std::vector<TemplatePyramid>> TemplatesMap;
    TemplatesMap class_templates;

    void matchClass(const LinearMemoryPyramid &lm_pyramid,
                    const std::vector<cv::Size> &sizes, float threshold,
                    std::vector<Match> &matches,
                    const std::string &class_id,
                    const std::vector<TemplatePyramid> &template_pyramids) const;
};

}  // namespace line2Dup

#endif  // SBM_ORI16_LINE2DUP_H
