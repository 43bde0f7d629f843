package weka.classifiers;
import weka.core.Instances;
public interface Classifier {
    void buildClassifier(Instances data) throws Exception;
}
